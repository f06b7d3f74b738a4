"""CLI end-to-end tests (subprocess, CPU platform via KBBQ_PLATFORM)."""

import gzip
import os
import subprocess
import sys

import numpy as np
import pytest

from kbbq_tpu.io.fastq import parse_fastq_bytes
from kbbq_tpu.utils.synth import make_dataset, to_fastq_bytes

ENV = {**os.environ, "KBBQ_PLATFORM": "cpu"}
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(*args, timeout=300):
    return subprocess.run(
        [sys.executable, "-m", "kbbq_tpu", *args], env=ENV, cwd=REPO,
        capture_output=True, timeout=timeout)


@pytest.fixture(scope="module")
def fq_file(tmp_path_factory):
    ds = make_dataset(genome_len=800, read_len=50, coverage=15.0,
                      error_rate=0.02, seed=61)
    p = tmp_path_factory.mktemp("cli") / "in.fq"
    p.write_bytes(to_fastq_bytes(ds))
    return p


def test_cli_recalibrate_fastq_stdout(fq_file):
    r = run_cli("recalibrate", str(fq_file), "-k", "16", "-c", "15",
                "--batch-size", "64")
    assert r.returncode == 0, r.stderr.decode()
    out = parse_fastq_bytes(r.stdout)
    src = parse_fastq_bytes(fq_file.read_bytes())
    assert out.num_reads == src.num_reads
    for i in range(out.num_reads):
        assert out.seq_bytes(i) == src.seq_bytes(i)
    assert b"recalibrated" in r.stderr


def test_cli_recalibrate_gzip_input(fq_file, tmp_path):
    gz = tmp_path / "in.fq.gz"
    gz.write_bytes(gzip.compress(fq_file.read_bytes()))
    out = tmp_path / "out.fq"
    r = run_cli("recalibrate", str(gz), "-k", "16", "-c", "15",
                "--batch-size", "64", "-o", str(out))
    assert r.returncode == 0, r.stderr.decode()
    # gzip input produces identical quality output to plain input
    r2 = run_cli("recalibrate", str(fq_file), "-k", "16", "-c", "15",
                 "--batch-size", "64")
    assert out.read_bytes() == r2.stdout


def test_cli_multiple_inputs_are_read_groups(fq_file, tmp_path):
    ds2 = make_dataset(genome_len=800, read_len=50, coverage=15.0,
                       error_rate=0.04, seed=62)
    p2 = tmp_path / "in2.fq"
    p2.write_bytes(to_fastq_bytes(ds2))
    o1, o2 = tmp_path / "o1.fq", tmp_path / "o2.fq"
    r = run_cli("recalibrate", str(fq_file), str(p2), "-k", "16",
                "-c", "15", "--batch-size", "64",
                "-o", str(o1), "-o", str(o2))
    assert r.returncode == 0, r.stderr.decode()
    assert b"read_groups" not in r.stderr  # stderr is the summary line
    f1 = parse_fastq_bytes(o1.read_bytes())
    f2 = parse_fastq_bytes(o2.read_bytes())
    assert f1.num_reads + f2.num_reads == \
        parse_fastq_bytes(fq_file.read_bytes()).num_reads + \
        parse_fastq_bytes(p2.read_bytes()).num_reads


def test_cli_bad_args():
    r = run_cli("recalibrate")
    assert r.returncode != 0
    r = run_cli("frobnicate", "x")
    assert r.returncode != 0
