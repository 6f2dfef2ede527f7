"""FrameNet-style frame/exemplar ingest (SURVEY.md §2.1 S11).

The reference (RCEE/QuestionAnswering/util_framenet.py:6-48) walks the
NLTK FrameNet corpus and dumps two JSON artifacts:

  frame.json          — one object per frame: {name, definition,
                        lexunit: [lu keys], fes: [[fe, coreType,
                        definition], ...]}
  frame_examples.json — one object per exemplar sentence: {name,
                        lexunit, text, target: [[start, end], ...],
                        fe: [[start, end, fe_name], ...]}

The corpus itself is external (NLTK download) and out of scope; what IS
in scope is the engine side: ingesting those artifacts as dimension
tables and fanning them out for joins against the trigger/argument
kernels. Spark-first: multiLine JSON array reads with EXPLICIT schemas
(no sampling-based inference job), explode/transform fan-outs that stay
in the JVM, and dimensions small enough that every consumer join is a
broadcast (a few thousand frames vs billions of docs at target scale).

No external data: tests synthesize the artifacts deterministically via
`synth_framenet` — same shapes, fabricated content.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# fes rows arrive as [fe_name, core_type, definition] triples (the
# reference dumps lists, not objects — util_framenet.py:19)
FRAME_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("definition", T.StringType()),
        T.StructField("lexunit", T.ArrayType(T.StringType())),
        T.StructField("fes", T.ArrayType(T.ArrayType(T.StringType()))),
    ]
)

SPAN2 = T.ArrayType(T.ArrayType(T.IntegerType()))  # [[start, end], ...]

EXEMPLAR_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("lexunit", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("target", SPAN2),
        # [start, end, fe_name] — mixed types arrive as strings, cast on use
        T.StructField("fe", T.ArrayType(T.ArrayType(T.StringType()))),
    ]
)


def read_frames(spark: SparkSession, path: str) -> DataFrame:
    """frame.json (one JSON array) -> frame dimension (S11a)."""
    return spark.read.schema(FRAME_SCHEMA).option("multiLine", True).json(path)


def read_exemplars(spark: SparkSession, path: str) -> DataFrame:
    """frame_examples.json (one JSON array) -> exemplar table (S11b)."""
    return (
        spark.read.schema(EXEMPLAR_SCHEMA).option("multiLine", True).json(path)
    )


def frame_elements(frames: DataFrame) -> DataFrame:
    """Explode the FE triples into a (frame, fe_name, core_type,
    fe_definition) dimension — the ontology fan-out the reference builds
    ad hoc in python (util_framenet.py:19). Pure explode/element_at."""
    fe = F.explode("fes").alias("fe")
    return frames.select(F.col("name").alias("frame"), fe).select(
        "frame",
        F.element_at("fe", 1).alias("fe_name"),
        F.element_at("fe", 2).alias("core_type"),
        F.element_at("fe", 3).alias("fe_definition"),
    )


def lexunit_index(frames: DataFrame) -> DataFrame:
    """Explode lexunits into a (lexunit, lemma, pos, frame) lookup — the
    broadcast dimension a trigger-candidate join consumes (lexunit keys
    are 'lemma.POS' strings in the corpus)."""
    lu = F.explode("lexunit").alias("lexunit")
    return frames.select(lu, F.col("name").alias("frame")).select(
        "lexunit",
        F.substring_index("lexunit", ".", 1).alias("lemma"),
        F.substring_index("lexunit", ".", -1).alias("pos"),
        "frame",
    )


def exemplar_fe_surfaces(exemplars: DataFrame) -> DataFrame:
    """Explode each exemplar's FE spans and slice the surface text with
    JVM-side expressions (substring is 1-based; spans are char offsets,
    end exclusive, per the reference dump)."""
    fe = F.explode("fe").alias("f")
    ex = exemplars.select(
        F.col("name").alias("frame"), "lexunit", "text", fe
    )
    start = F.element_at("f", 1).cast("int")
    end = F.element_at("f", 2).cast("int")
    return ex.select(
        "frame",
        "lexunit",
        F.element_at("f", 3).alias("fe_name"),
        start.alias("start"),
        end.alias("end"),
        F.expr("substring(text, cast(element_at(f, 1) as int) + 1, "
               "cast(element_at(f, 2) as int) - "
               "cast(element_at(f, 1) as int))").alias("fe_text"),
    )


def framenet_data(n_frames: int = 8, exemplars_per_lu: int = 3
                  ) -> tuple[list[dict], list[dict]]:
    """Deterministic FrameNet-shaped fixture data (no external data) —
    the (frames, examples) lists util_framenet.py would dump. Content is
    fabricated from a fixed word list; shapes match the reference's two
    JSON artifacts exactly. Shared by the file-writing fixture AND the
    contract oracle (which embeds the same rows as SQL VALUES, so the
    two engines compute the fan-out + substring math independently)."""
    words = ["alpha", "beta", "gamma", "delta", "omega", "sigma", "kappa",
             "theta", "lambda", "zeta"]
    frames, examples = [], []
    for i in range(n_frames):
        name = f"Frame_{i:03d}"
        lus = [f"{words[(i + k) % len(words)]}.v" for k in range(1 + i % 3)]
        fes = [
            [f"FE_{i}_{j}", "Core" if j == 0 else "Peripheral",
             f"definition of FE_{i}_{j}"]
            for j in range(2 + i % 2)
        ]
        frames.append(
            {
                "name": name,
                "definition": f"definition of {name}",
                "lexunit": lus,
                "fes": fes,
            }
        )
        for lu in lus:
            lemma = lu.split(".")[0]
            for e in range(exemplars_per_lu):
                filler = words[(i + e) % len(words)]
                text = f"the {filler} will {lemma} the {words[e]}"
                t0 = text.index(lemma)
                fe_spans = [
                    [4, 4 + len(filler), fes[0][0]],
                ]
                if len(fes) > 1:
                    o0 = len(text) - len(words[e])
                    fe_spans.append([o0, len(text), fes[1][0]])
                examples.append(
                    {
                        "name": name,
                        "lexunit": lu,
                        "text": text,
                        "target": [[t0, t0 + len(lemma)]],
                        "fe": [[str(s), str(e_), fn]
                               for s, e_, fn in fe_spans],
                    }
                )
    return frames, examples


def synth_framenet(out_dir: str, n_frames: int = 8, exemplars_per_lu: int = 3
                   ) -> tuple[str, str]:
    """Write the deterministic fixture as frame.json + frame_examples.json
    under out_dir; returns both paths. Writes are atomic (temp + rename)
    so concurrent runs sharing a fixture dir never see a partial file —
    the content is deterministic, so whichever writer wins is correct."""
    frames, examples = framenet_data(n_frames, exemplars_per_lu)
    out = []
    for fname, payload in (
        ("frame.json", frames),
        ("frame_examples.json", examples),
    ):
        path = os.path.join(out_dir, fname)
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(payload, f)
        os.replace(tmp, path)
        out.append(path)
    return out[0], out[1]
