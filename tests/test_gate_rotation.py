"""Driver-gate rotation ordering (__spark_entry__._order_names).

Round-6 verdict: entries rewritten AFTER their last green sat mid-pack
under the staleness-only rotation. Round-10 revision: transitive-import
fallout no longer forms its own tier (a shared-module round flags 100+
entries and starves the staleness bound); groups are reds,
never-checked, own-function rewrites, then all greens stalest-first
with transitive fallout winning same-round ties.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entry_mod


def test_order_groups_and_staleness():
    led = {
        "red_r5": (5, False),
        "red_r3": (3, False),
        "green_r2": (2, True),
        "green_r6": (6, True),
        "rewritten_r5": (5, True),
        "rewritten_r2": (2, True),
        "fallout_r4": (4, True),
    }
    changed = {"rewritten_r5": 0, "rewritten_r2": 0, "fallout_r4": 1}
    names = ["green_r6", "new_b", "rewritten_r5", "red_r5", "fallout_r4",
             "green_r2", "new_a", "rewritten_r2", "red_r3"]
    got = entry_mod._order_names(names, led, changed)
    assert got == [
        "red_r3", "red_r5",            # reds first, stalest first
        "new_a", "new_b",              # never checked
        "rewritten_r2", "rewritten_r5",  # own-function rewrites
        "green_r2",                    # merged tier: stalest first...
        "fallout_r4",                  # ...transitive ahead of unchanged
        "green_r6",                    # only as a same-round tie-break
    ]


def test_live_rotation_boosts_r6_rewrites():
    # Integration: on the real ledger + git history, the two round-6
    # rewrites flagged by the verdict (their last greens predate the
    # two-level-sum rewrite) must rank ahead of every unchanged green.
    led = entry_mod._ledger()
    if not led:
        return  # fresh checkout without CORRECTNESS files
    changed = entry_mod._changed_since_check(led)
    order = entry_mod._order_names(list(entry_mod.REGISTRY), led, changed)
    pos = {n: i for i, n in enumerate(order)}
    unchanged_green = [
        n for n in order
        if led.get(n, (0, False))[1] and n not in changed
    ]
    if not unchanged_green:
        return
    first_unchanged = min(pos[n] for n in unchanged_green)
    for n, lvl in changed.items():
        if lvl == 0:
            assert pos[n] < first_unchanged, (n, pos[n], first_unchanged)


def test_changed_since_check_levels_are_0_or_1():
    led = entry_mod._ledger()
    changed = entry_mod._changed_since_check(led)
    assert all(v in (0, 1) for v in changed.values())
    # Every flagged entry must be a green one (reds/new are already first).
    for n in changed:
        assert led[n][1] is True
