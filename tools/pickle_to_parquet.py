"""CLI for the S9/S10 one-shot pickle -> parquet conversions.

Usage:
  python tools/pickle_to_parquet.py examples <in.pkl> <out.parquet>
  python tools/pickle_to_parquet.py vocab    <in.pkl> <out.parquet>
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")


def main():
    kind, src, dst = sys.argv[1], sys.argv[2], sys.argv[3]
    from deepee_spark.session import get_spark
    from deepee_spark.sources.pickle_convert import (
        examples_pickle_to_parquet,
        vocab_pickle_to_parquet,
    )

    spark = get_spark("pickle-convert")
    fn = {"examples": examples_pickle_to_parquet, "vocab": vocab_pickle_to_parquet}[kind]
    out = fn(spark, src, dst)
    print(f"wrote {out.count()} rows -> {dst}")


if __name__ == "__main__":
    main()
