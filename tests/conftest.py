"""Shared fixtures: sonnets golden corpus, SparkSession, transcript tables."""

from __future__ import annotations

import datetime
import importlib.util
import os

import pytest

SONNETS_PATH = "/root/reference/samples/inverted_index/sonnets.py"


def load_sonnets() -> list[str] | None:
    """Load the 154-sonnet golden corpus from the read-only reference repo
    (public-domain data; loaded at test time, never vendored)."""
    if not os.path.exists(SONNETS_PATH):
        return None
    spec = importlib.util.spec_from_file_location("_ref_sonnets", SONNETS_PATH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return list(mod.sonnets)


@pytest.fixture(scope="session")
def sonnets() -> list[str]:
    corpus = load_sonnets()
    if corpus is None:
        pytest.skip("reference sonnets corpus not available")
    return corpus


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    local_dir = "/dev/shm/tsidx-test-local" if os.path.isdir("/dev/shm") else "/tmp"
    os.makedirs(local_dir, exist_ok=True)
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("tsidx-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .config("spark.local.dir", local_dir)
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
    spark.stop()


def sonnets_transcript_rows(sonnets: list[str]):
    """Map the sonnets corpus to the transcripts schema (FIXTURES.md §1a):
    one sonnet -> one turn; groups of 10 turns per conversation; docID order
    (conv_id, turn_idx) == reference insertion order."""
    base = datetime.datetime(2026, 1, 1, tzinfo=datetime.timezone.utc)
    return [
        (
            f"sonnet-{i // 10:03d}",
            i % 10,
            "user",
            text,
            "",
            base + datetime.timedelta(minutes=i),
        )
        for i, text in enumerate(sonnets)
    ]


TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)


@pytest.fixture(scope="session")
def sonnets_transcripts(spark, sonnets):
    df = spark.createDataFrame(sonnets_transcript_rows(sonnets), TRANSCRIPT_SCHEMA)
    df = df.repartition(8).cache()
    df.count()
    return df
