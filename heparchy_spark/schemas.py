"""Canonical schemas for the heparchy-spark data model.

The reference (jacanchaplais/heparchy) stores a four-level hierarchy
``file -> process -> event-chunk -> event -> per-particle datasets``
(see ``/root/reference/heparchy/write/hdf.py:448,439-445,240-243``).
We normalize it into long-format tables (SURVEY.md §1.6): ``particles``,
``events``, ``edges``, ``processes`` — partitioned by ``(process, chunk_id)``
so the reference's 1000-events-per-chunk physical grouping
(``write/hdf.py:534-537``) becomes Hive partition pruning.

Core column dtypes mirror the reference's fixed write-path dtypes:
``pmu`` float64 x4 (``write/hdf.py:336``), ``pdg`` int32 (``:366``),
``status``/``helicity`` int16 (``:383,:398``), ``color`` int32 pair
(``:351``), ``edges`` int32 pair (``:297``), ``edge_weights`` float64
(``:319``), masks bool (``:107``).
"""

from __future__ import annotations

import pyspark.sql.types as T

__all__ = [
    "PARTICLES_SCHEMA",
    "EVENTS_SCHEMA",
    "EDGES_SCHEMA",
    "PROCESSES_SCHEMA",
    "EVTS_PER_CHUNK_DEFAULT",
    "CORE_PARTICLE_COLUMNS",
]

# Default chunking factor — mirrors the reference's default
# (``/root/reference/heparchy/write/hdf.py:555``).
EVTS_PER_CHUNK_DEFAULT = 1000

# One row per particle.  ``pmu`` struct -> flat px,py,pz,e doubles so Parquet
# column pruning works per-component; the reader facade can re-struct them.
PARTICLES_SCHEMA = T.StructType(
    [
        T.StructField("process", T.StringType(), False),
        T.StructField("event_id", T.LongType(), False),
        T.StructField("chunk_id", T.LongType(), False),
        T.StructField("pcl_idx", T.IntegerType(), False),
        T.StructField("px", T.DoubleType(), True),
        T.StructField("py", T.DoubleType(), True),
        T.StructField("pz", T.DoubleType(), True),
        T.StructField("e", T.DoubleType(), True),
        T.StructField("pdg", T.IntegerType(), True),
        T.StructField("status", T.ShortType(), True),
        T.StructField("helicity", T.ShortType(), True),
        T.StructField("color", T.IntegerType(), True),
        T.StructField("anticolor", T.IntegerType(), True),
        # masks/customs are dynamic; ``mask_final`` is the conventional one
        # (``read/hdf.py:318-321``). Extra mask_<name>/custom_<name> columns
        # are appended at ingest (schema-on-write).
        T.StructField("mask_final", T.BooleanType(), True),
    ]
)

CORE_PARTICLE_COLUMNS = [f.name for f in PARTICLES_SCHEMA.fields]

# One row per event — the metadata short-circuit table (counts answered
# without scanning particles; mirrors ``read/hdf.py:255-260,444-445``).
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("process", T.StringType(), False),
        T.StructField("event_id", T.LongType(), False),
        T.StructField("chunk_id", T.LongType(), False),
        T.StructField("num_pcls", T.LongType(), False),
        T.StructField("num_edges", T.LongType(), False),
        T.StructField("mask_keys", T.ArrayType(T.StringType()), True),
        T.StructField("custom_keys", T.ArrayType(T.StringType()), True),
        T.StructField(
            "custom_meta", T.MapType(T.StringType(), T.StringType()), True
        ),
    ]
)

# One row per DAG edge (COO layout, ``write/hdf.py:285-299``).
EDGES_SCHEMA = T.StructType(
    [
        T.StructField("process", T.StringType(), False),
        T.StructField("event_id", T.LongType(), False),
        T.StructField("chunk_id", T.LongType(), False),
        T.StructField("edge_idx", T.IntegerType(), False),
        T.StructField("src", T.IntegerType(), True),
        T.StructField("dst", T.IntegerType(), True),
        T.StructField("weight", T.DoubleType(), True),
    ]
)

# One row per process — file/process attrs (``write/hdf.py:455-487``).
PROCESSES_SCHEMA = T.StructType(
    [
        T.StructField("process", T.StringType(), False),
        T.StructField("process_string", T.StringType(), True),
        T.StructField("signal_pdgs", T.ArrayType(T.IntegerType()), True),
        T.StructField("com_e", T.DoubleType(), True),
        T.StructField("e_unit", T.StringType(), True),
        T.StructField("num_evts", T.LongType(), True),
        T.StructField("evts_per_chunk", T.LongType(), True),
        T.StructField(
            "custom_meta", T.MapType(T.StringType(), T.StringType()), True
        ),
    ]
)
