"""Transcript sources.

The engine's canonical input (BASELINE.json input_hint) is an Iceberg
table::

    transcripts(conv_id string, turn_idx int, role string,
                text string, tool string, ts timestamp)

In the reference, a document's parts are located via the IIIF manifest
+ annotation list (app/process/dspace.go:11-49) and ordered by METS or
bundle order (app/handler/indexer.go:81-95). Here the locator role is
played by the table's (conv_id, turn_idx) key and ordering is explicit.

Three sources:

- ``read_transcripts``      — real input: Iceberg catalog table if the
  runtime has the Iceberg jar, else a parquet path (sandbox fallback).
- ``derive_transcripts``    — deterministic derivation of a transcripts
  table from the driver-provided ``documents`` test table by chunking
  each document into fixed-size word turns. The SAME derivation exists
  as a DuckDB CTE (``oracle_transcripts_cte``) so the driver's oracle
  can reproduce it exactly. Rejoining turns with ' ' reproduces the
  original document text (round-trip invariant, verified in tests).
- ``synth_transcripts``     — seeded generator with adversarial shapes
  (empty turns, whitespace-only turns, unicode, duplicate turn_idx)
  used by pytest to exercise dense-ordinal semantics (the reference's
  skip-empty-then-number rule, app/handler/indexer.go:98-148).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)


def read_transcripts(spark: SparkSession, location: str) -> DataFrame:
    """Read the real transcripts table.

    ``location`` is either an Iceberg catalog table name (contains no
    '/') or a parquet path. On a production cluster this is
    ``spark.table("catalog.db.transcripts")`` — snapshot-pinned scans,
    partition pruning on conv_id buckets, row-level deletes all come
    from Iceberg. The sandbox has no Iceberg runtime jar, so the
    parquet path keeps every test hermetic (SURVEY §7.3).
    """
    if "/" not in location:
        return spark.table(location)
    return spark.read.parquet(location)


# ---------------------------------------------------------------------------
# Deterministic transcripts derived from the documents test table.
# Spark SQL and DuckDB SQL below are dialect twins — keep in lockstep.
# ---------------------------------------------------------------------------

_SPARK_CTE = """
WITH words AS (
  SELECT doc_id, split(text, ' ') AS w FROM {documents}
),
turnized AS (
  SELECT concat('c', lpad(CAST(doc_id AS STRING), 8, '0')) AS conv_id,
         CAST(t.i AS INT) AS turn_idx,
         array_join(slice(w, t.i * {tw} + 1, {tw}), ' ') AS text
  FROM words
  LATERAL VIEW explode(sequence(0, CAST(ceil(size(w) / {tw}.0) AS INT) - 1)) t AS i
)
SELECT conv_id, turn_idx,
       CASE WHEN turn_idx % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
       text,
       CASE WHEN turn_idx % 5 = 3 THEN 'search'
            WHEN turn_idx % 5 = 1 THEN 'code' END AS tool,
       TIMESTAMP '2026-01-01 00:00:00' + make_interval(0, 0, 0, 0, 0, turn_idx, 0) AS ts
FROM turnized
"""

_DUCKDB_CTE = """
words AS (
  SELECT doc_id, str_split(text, ' ') AS w FROM documents
),
turnized AS (
  SELECT 'c' || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS conv_id,
         CAST(unnest(range(CAST(ceil(len(w) / {tw}.0) AS BIGINT))) AS INT) AS turn_idx,
         w
  FROM words
),
transcripts AS (
  SELECT conv_id, turn_idx,
         CASE WHEN turn_idx % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
         array_to_string(w[turn_idx * {tw} + 1 : turn_idx * {tw} + {tw}], ' ') AS text,
         CASE WHEN turn_idx % 5 = 3 THEN 'search'
              WHEN turn_idx % 5 = 1 THEN 'code' END AS tool,
         TIMESTAMP '2026-01-01 00:00:00' + INTERVAL 1 MINUTE * turn_idx AS ts
  FROM turnized
)
"""


def derive_transcripts(
    spark: SparkSession, sf_dir: str, turn_words: int = 12
) -> DataFrame:
    """Deterministic transcripts view over ``{sf_dir}/documents.parquet``."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    view = f"__documents_{abs(hash(sf_dir)) % 10**8}"
    docs.createOrReplaceTempView(view)
    return spark.sql(_SPARK_CTE.format(documents=view, tw=turn_words))


def oracle_transcripts_cte(turn_words: int = 12) -> str:
    """DuckDB CTE body (words, turnized, transcripts) mirroring
    :func:`derive_transcripts` — prepend as ``WITH {cte}, ...``."""
    return _DUCKDB_CTE.format(tw=turn_words).strip()


# ---------------------------------------------------------------------------
# Seeded synthetic corpus for pytest (adversarial shapes).
# ---------------------------------------------------------------------------

_WORDS = (
    "the spark shuffle window merge join scan filter agg sort batch stream "
    "query plan index posting term score doc turn tool café naïve Ω k8s "
    "gpu data row column vector hash"
).split()


def synth_transcripts(
    spark: SparkSession,
    n_convs: int = 20,
    max_turns: int = 12,
    seed: int = 7,
    empty_turn_every: int = 5,
) -> DataFrame:
    """Deterministic synthetic transcripts with empty / whitespace-only
    turns (every ``empty_turn_every``-th turn) to exercise the dense
    ordinal rule: empties are skipped BEFORE numbering, exactly like
    the reference skips empty OCR bodies before incrementing the page
    position counter (app/handler/indexer.go:98-148)."""
    import datetime
    import random

    rng = random.Random(seed)
    rows = []
    base = datetime.datetime(2026, 1, 1)
    for c in range(n_convs):
        conv_id = f"s{c:06d}"
        n_turns = rng.randint(1, max_turns)
        for t in range(n_turns):
            if empty_turn_every and t % empty_turn_every == empty_turn_every - 1:
                text = "" if t % 2 == 0 else "   "
            else:
                text = " ".join(
                    rng.choice(_WORDS) for _ in range(rng.randint(3, 20))
                )
            rows.append(
                (
                    conv_id,
                    t,
                    "user" if t % 2 == 0 else "assistant",
                    text,
                    "search" if t % 5 == 3 else None,
                    base + datetime.timedelta(minutes=t),
                )
            )
    return spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)
