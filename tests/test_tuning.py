"""Volume-derived shuffle sizing (tsidx/tuning.py)."""

import os

import pytest

from tsidx.tuning import (
    PARQUET_EXPANSION,
    TOKEN_EXPANSION,
    dir_input_bytes,
    shuffle_partitions_for,
    tune_shuffle,
)


def test_floor_is_core_count_for_small_inputs():
    assert shuffle_partitions_for(0, 32) == 32
    assert shuffle_partitions_for(1 << 20, 32) == 32
    # and never below 8 even on tiny machines
    assert shuffle_partitions_for(0, 2) == 8


def test_scales_linearly_with_volume():
    one_tb = 1 << 40
    n1 = shuffle_partitions_for(one_tb, 32)
    n10 = shuffle_partitions_for(10 * one_tb, 32)
    assert n1 > 32  # volume term dominates the floor
    assert 9.5 <= n10 / n1 <= 10.5  # 10x data -> ~10x partitions


def test_target_is_128mb_in_memory():
    # 128 GB in-memory (expansion folded in by passing expansion=1)
    n = shuffle_partitions_for(128 << 30, 32, expansion=1.0)
    assert n == 1024


def test_token_workloads_size_larger_than_generic():
    b = 1 << 33  # 8 GB of parquet text
    assert shuffle_partitions_for(
        b, 32, expansion=TOKEN_EXPANSION
    ) > shuffle_partitions_for(b, 32, expansion=PARQUET_EXPANSION)


def test_dir_input_bytes_handles_files_and_dirs(tmp_path):
    f = tmp_path / "part-0.parquet"
    f.write_bytes(b"x" * 1000)
    (tmp_path / "_SUCCESS").write_bytes(b"")
    (tmp_path / ".hidden").write_bytes(b"y" * 50)
    assert dir_input_bytes(str(tmp_path)) == 1000  # markers skipped
    assert dir_input_bytes(str(f)) == 1000  # plain file works too
    assert dir_input_bytes(str(tmp_path / "missing")) == 0


def test_tune_shuffle_sets_session_conf(spark, tmp_path):
    f = tmp_path / "data.bin"
    f.write_bytes(b"x" * (1 << 20))
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        # 1 MB * 4096 replicas * 24x expansion ~= 96 GB -> ~768 partitions
        n = tune_shuffle(
            spark, str(f), cpus=32, replicas=4096, expansion=TOKEN_EXPANSION
        )
        assert n == spark.sparkContext.getConf().get(
            "spark.sql.shuffle.partitions", None
        ) or str(n) == spark.conf.get("spark.sql.shuffle.partitions")
        assert n == 768
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
