"""ACE/DuEE-style annotated-sentence sources (SURVEY.md §2.1 S1-S3).

Three physical encodings appear in the reference; each maps to a
spark.read.json plan plus a normalizing projection into the ONE canonical
sentence schema used by kernels and eval:

  S1  ACE JSON array file (one big JSON array of sentence objects)
      — MOGANED data_load.py:17-53; multiLine read + explode-free scan,
        min-length filter (>=5) and MAXLEN truncation semantics
  S2  JSONL where each line is an ARRAY of sentence objects
      — JMEE Data.py:192-206; per-line json array -> explode
  S3  sentence-per-line JSONL {sentence, event, s_start}
      — QAEE run_args_qa.py:86-97

Canonical output schema (CANONICAL_SENTENCE):
  doc_id string, sent_id int, words array<string>, pos_tags array<string>,
  entities array<struct<start,end,entity_type>>,
  events array<struct<trigger_start,trigger_end,event_type,
                      arguments array<struct<start,end,role>>>>

Spark-first notes: the JSON codec + schema projection stay in the JVM
(from_json / explode / transform); no Python is involved in any scan.
Filters (min length) and truncation (slice) are column expressions so
Catalyst pushes what it can into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..segment import CUTOFF, MIN_TOKENS

ARG_T = T.StructType(
    [
        T.StructField("start", T.IntegerType()),
        T.StructField("end", T.IntegerType()),
        T.StructField("role", T.StringType()),
    ]
)

EVENT_T = T.StructType(
    [
        T.StructField("trigger_start", T.IntegerType()),
        T.StructField("trigger_end", T.IntegerType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("arguments", T.ArrayType(ARG_T)),
    ]
)

ENTITY_T = T.StructType(
    [
        T.StructField("start", T.IntegerType()),
        T.StructField("end", T.IntegerType()),
        T.StructField("entity_type", T.StringType()),
    ]
)

CANONICAL_SENTENCE = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("sent_id", T.IntegerType()),
        T.StructField("words", T.ArrayType(T.StringType())),
        T.StructField("pos_tags", T.ArrayType(T.StringType())),
        T.StructField("entities", T.ArrayType(ENTITY_T)),
        T.StructField("events", T.ArrayType(EVENT_T)),
    ]
)

# raw ACE JSON object schema (field names as in MOGANED/JMEE data files;
# hyphens per the reference's JSON keys)
_ACE_RAW = T.StructType(
    [
        T.StructField("words", T.ArrayType(T.StringType())),
        T.StructField("pos-tags", T.ArrayType(T.StringType())),
        T.StructField(
            "golden-entity-mentions",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("start", T.IntegerType()),
                        T.StructField("end", T.IntegerType()),
                        T.StructField("entity-type", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField(
            "golden-event-mentions",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField(
                            "trigger",
                            T.StructType(
                                [
                                    T.StructField("start", T.IntegerType()),
                                    T.StructField("end", T.IntegerType()),
                                    T.StructField("text", T.StringType()),
                                ]
                            ),
                        ),
                        T.StructField("event_type", T.StringType()),
                        T.StructField(
                            "arguments",
                            T.ArrayType(
                                T.StructType(
                                    [
                                        T.StructField("start", T.IntegerType()),
                                        T.StructField("end", T.IntegerType()),
                                        T.StructField("role", T.StringType()),
                                    ]
                                )
                            ),
                        ),
                    ]
                )
            ),
        ),
    ]
)


def _normalize(raw: DataFrame, doc_id_col, sent_id_col) -> DataFrame:
    """Raw ACE object columns -> CANONICAL_SENTENCE with F1/F2 semantics:
    drop len<MIN_TOKENS (MOGANED data_load.py:24-25), truncate words to
    CUTOFF, drop spans starting >= CUTOFF, clamp span ends (JMEE
    Sentence.py:16-18,41-43,65-67)."""
    c = F.lit(CUTOFF)
    ents = F.filter(
        F.coalesce(
            F.col("`golden-entity-mentions`"),
            F.array().cast(
                "array<struct<start:int,end:int,`entity-type`:string>>"
            ),
        ),
        lambda e: e["start"] < c,
    )
    evs = F.filter(
        F.coalesce(
            F.col("`golden-event-mentions`"),
            F.expr("CAST(array() AS array<struct<trigger:struct<start:int,end:int,text:string>,event_type:string,arguments:array<struct<start:int,end:int,role:string>>>>)"),
        ),
        lambda e: e["trigger"]["start"] < c,
    )
    return (
        raw.select(
            doc_id_col.alias("doc_id"),
            sent_id_col.cast("int").alias("sent_id"),
            F.slice(F.col("words"), 1, CUTOFF).alias("words"),
            F.slice(
                F.coalesce(F.col("`pos-tags`"), F.array().cast("array<string>")),
                1,
                CUTOFF,
            ).alias("pos_tags"),
            F.transform(
                ents,
                lambda e: F.struct(
                    e["start"].alias("start"),
                    F.least(e["end"], c).alias("end"),
                    e["entity-type"].alias("entity_type"),
                ),
            ).alias("entities"),
            F.transform(
                evs,
                lambda e: F.struct(
                    e["trigger"]["start"].alias("trigger_start"),
                    F.least(e["trigger"]["end"], c).alias("trigger_end"),
                    e["event_type"].alias("event_type"),
                    F.transform(
                        F.filter(
                            F.coalesce(
                                e["arguments"],
                                F.expr("CAST(array() AS array<struct<start:int,end:int,role:string>>)"),
                            ),
                            lambda a: a["start"] < c,
                        ),
                        lambda a: F.struct(
                            a["start"].alias("start"),
                            F.least(a["end"], c).alias("end"),
                            a["role"].alias("role"),
                        ),
                    ).alias("arguments"),
                ),
            ).alias("events"),
        )
        .filter(F.size("words") >= MIN_TOKENS)
    )


def read_ace_array(spark: SparkSession, path: str) -> DataFrame:
    """S1: one JSON array file of sentence objects (MOGANED layout)."""
    raw = spark.read.schema(_ACE_RAW).option("multiLine", True).json(path)
    raw = raw.withColumn("_file", F.input_file_name()).withColumn(
        "_idx", F.monotonically_increasing_id()
    )
    # sent_id: per-file running index. monotonically_increasing_id is NOT
    # contiguous across partitions — rank within file restores a stable,
    # deterministic ordering (multiLine arrays parse in file order).
    from pyspark.sql import Window as W

    rk = F.row_number().over(W.partitionBy("_file").orderBy("_idx")) - 1
    return _normalize(raw.withColumn("_rk", rk), F.col("_file"), F.col("_rk"))


def read_ace_jsonl_arrays(spark: SparkSession, path: str) -> DataFrame:
    """S2: JSONL, each line an ARRAY of sentence objects (JMEE layout).

    _rk is a dense per-file rank (row_number over the monotonic read id),
    NOT monotonically_increasing_id arithmetic: the raw id embeds
    partitionId<<33, so id*10000+pos overflows the downstream int cast as
    soon as the input splits into a second partition."""
    from pyspark.sql import Window as W

    lines = spark.read.text(path).select(
        F.input_file_name().alias("_file"),
        F.monotonically_increasing_id().alias("_idx"),
        F.from_json("value", T.ArrayType(_ACE_RAW)).alias("arr"),
    )
    line_rk = F.row_number().over(W.partitionBy("_file").orderBy("_idx")) - 1
    sent_rk = (
        F.row_number().over(W.partitionBy("_file").orderBy("_line", "_pos")) - 1
    )
    sent = (
        lines.withColumn("_line", line_rk)
        .select("_file", "_line", F.posexplode("arr").alias("_pos", "s"))
        .select("_file", sent_rk.alias("_rk"), "s.*")
    )
    return _normalize(sent, F.col("_file"), F.col("_rk"))


def read_sentence_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """S3: sentence-per-line JSONL {sentence:[tok], event:[[...]], s_start}
    (QAEE layout). event inner lists: [[offset, type], [s, e, role]...] with
    offsets relative to s_start (QAEE run_args_qa.py:86-103)."""
    schema = T.StructType(
        [
            T.StructField("sentence", T.ArrayType(T.StringType())),
            T.StructField(
                "event",
                T.ArrayType(T.ArrayType(T.ArrayType(T.StringType()))),
            ),
            T.StructField("s_start", T.IntegerType()),
        ]
    )
    raw = spark.read.schema(schema).json(path)
    raw = raw.withColumn("_file", F.input_file_name()).withColumn(
        "_idx", F.monotonically_increasing_id()
    )
    from pyspark.sql import Window as W

    rk = F.row_number().over(W.partitionBy("_file").orderBy("_idx")) - 1
    s0 = F.col("s_start")

    def _at(arr, i):
        # try_element_at: malformed short inner lists degrade to null
        # fields / dropped entries instead of an ANSI abort of the scan
        return F.try_element_at(arr, F.lit(i))

    wellformed = F.filter(
        F.coalesce(F.col("event"), F.expr("CAST(array() AS array<array<array<string>>>)")),
        lambda ev: (F.size(ev) >= 1) & (F.size(_at(ev, 1)) >= 2),
    )
    events = F.transform(
        wellformed,
        lambda ev: F.struct(
            (_at(_at(ev, 1), 1).cast("int") - s0).alias("trigger_start"),
            (_at(_at(ev, 1), 1).cast("int") - s0 + 1).alias("trigger_end"),
            _at(_at(ev, 1), 2).alias("event_type"),
            F.transform(
                F.filter(
                    F.slice(ev, 2, F.greatest(F.size(ev) - 1, F.lit(0))),
                    lambda a: F.size(a) >= 3,
                ),
                lambda a: F.struct(
                    (_at(a, 1).cast("int") - s0).alias("start"),
                    (_at(a, 2).cast("int") - s0 + 1).alias("end"),
                    _at(a, 3).alias("role"),
                ),
            ).alias("arguments"),
        ),
    )
    out = raw.withColumn("_rk", rk).select(
        F.col("_file").alias("doc_id"),
        F.col("_rk").cast("int").alias("sent_id"),
        F.slice("sentence", 1, CUTOFF).alias("words"),
        F.array().cast("array<string>").alias("pos_tags"),
        F.expr(
            "CAST(array() AS array<struct<start:int,end:int,entity_type:string>>)"
        ).alias("entities"),
        events.alias("events"),
    )
    return out.filter(F.size("words") >= MIN_TOKENS)
