"""Regenerate the pinned golden-row oracles for the multimodal gate
entries (kwwhat_spark/queries/llm.py _MULTIMODAL_*_PINNED).

The multimodal fixture set (synthesize_media seed=42) and every decoder
are deterministic pure functions, so the entries' outputs are constants;
this prints the literal VALUES oracle for each. Run after an INTENTIONAL
decoder/fixture change and paste the output over the pinned constants:

    python -m tests.pin_multimodal
"""

from __future__ import annotations


def _values_sql(rows, columns, types) -> str:
    def lit(v, t):
        if v is None:
            return f"CAST(NULL AS {t})"
        if t == "VARCHAR":
            return "'" + str(v).replace("'", "''") + "'"
        return f"CAST({v} AS {t})"

    body = ",\n      ".join(
        "(" + ", ".join(lit(v, t) for v, t in zip(row, types)) + ")"
        for row in rows
    )
    cols = ", ".join(columns)
    return (
        "\n    SELECT * FROM (VALUES\n      "
        + body
        + f"\n    ) AS t({cols})\n"
    )


def main() -> None:
    from kwwhat_spark.queries.llm import (
        multimodal_features,
        multimodal_frame_features,
    )
    from kwwhat_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    df = multimodal_features(spark, "")
    rows = sorted(tuple(r) for r in df.collect())
    print("_MULTIMODAL_FEATURES_PINNED = \"\"\"", end="")
    print(
        _values_sql(
            rows,
            ["modality", "decoder", "media_count", "total_bytes",
             "distinct_payloads", "sum_feature0_micro"],
            ["VARCHAR", "VARCHAR", "BIGINT", "BIGINT", "BIGINT", "BIGINT"],
        ),
        end="",
    )
    print('"""')

    df2 = multimodal_frame_features(spark, "")
    rows2 = sorted(tuple(r) for r in df2.collect())
    print("_MULTIMODAL_FRAME_FEATURES_PINNED = \"\"\"", end="")
    print(
        _values_sql(
            rows2,
            ["media_id", "frame_count", "distinct_frames", "sum_feature0_micro"],
            ["BIGINT", "BIGINT", "BIGINT", "BIGINT"],
        ),
        end="",
    )
    print('"""')


if __name__ == "__main__":
    main()
