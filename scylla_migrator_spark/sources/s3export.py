"""DynamoDB S3-export source: manifest-summary -> manifest-files -> gzip
JSON-lines data files -> item variant columns.

Reference parity — readers/DynamoDBS3Export.scala:54-221 (manifest parsing
:69-134, data read :136-169, item decode :240-292). Export layout:

    <root>/manifest-summary.json      {"itemCount": N, "manifestFilesS3Key": ...}
    <root>/manifest-files.json        one JSON object per line:
                                      {"dataFileS3Key": ..., "itemCount": n}
    <root>/data/*.json.gz             one {"Item": {attr: {tag: val}}} per line

Manifest parsing happens on the driver (tiny); data files go through
``spark.read.text`` + ``from_json`` — fully distributed, pushdown-friendly.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from scylla_migrator_spark.functions.ddb_variant import ITEM_SCHEMA

MANIFEST_SUMMARY = "manifest-summary.json"
MANIFEST_FILES = "manifest-files.json"


def read_manifest_summary(root: str) -> dict:
    with open(os.path.join(root, MANIFEST_SUMMARY)) as f:
        return json.load(f)


def read_manifest_files(root: str) -> list[dict]:
    entries = []
    with open(os.path.join(root, MANIFEST_FILES)) as f:
        for line in f:
            line = line.strip()
            if line:
                entries.append(json.loads(line))
    return entries


def read_s3_export(spark: SparkSession, root: str, skip_files: list[str] | None = None) -> DataFrame:
    """Read an export: returns (item: map<string,variant>, item_json: string).

    ``skip_files`` = resume skip-set of dataFileS3Key values (S10/F5
    semantics applied to export data files)."""
    summary = read_manifest_summary(root)
    files = read_manifest_files(root)
    skip = set(skip_files or [])
    paths = [
        os.path.join(root, e["dataFileS3Key"]) for e in files if e["dataFileS3Key"] not in skip
    ]
    if not paths:
        raise FileNotFoundError(f"no data files to process in export {root}")
    raw = spark.read.text(paths)  # gzip inferred from .gz extension
    wrapper = T.StructType([T.StructField("Item", ITEM_SCHEMA)])
    parsed = raw.select(F.from_json(F.col("value"), wrapper).getField("Item").alias("item"),
                        F.col("value").alias("item_json"))
    expected = summary.get("itemCount")
    if expected is not None and not skip:
        parsed = parsed.withColumn("__expected_total", F.lit(expected)).drop("__expected_total")
    return parsed
