"""Native C++ codec vs pure-Python reference equivalence."""

import numpy as np
import pytest

from kbbq_tpu.io import bgzf
from kbbq_tpu.io.fastq import parse_fastq_bytes
from kbbq_tpu.io import native_lib

needs_native = pytest.mark.skipif(native_lib.get_lib() is None,
                                  reason="native lib not built")


@needs_native
def test_native_bgzf_matches_python():
    rng = np.random.default_rng(0)
    for size in (0, 1, 1000, 70000, 500_000):
        data = rng.integers(0, 256, size, dtype=np.uint8).tobytes()
        nat = native_lib.bgzf_compress(data)
        assert bgzf._decompress_py(nat) == data       # python reads native
        py = bgzf._compress_py(data)
        assert native_lib.bgzf_decompress(py) == data  # native reads python
        assert bgzf.decompress(bgzf.compress(data)) == data


@needs_native
def test_native_bgzf_rejects_garbage():
    with pytest.raises(bgzf.BGZFError):
        bgzf.decompress(b"garbage" * 10)


@needs_native
def test_native_fastq_index_matches_numpy():
    fq_bytes = b"@r1 c\nACGT\n+\nFFFF\n@r2/2\nGGTTA\n+junk\n!!!!!\n"
    buf = np.frombuffer(fq_bytes, dtype=np.uint8)
    idx = native_lib.fastq_index(buf.copy())
    assert idx.shape == (2, 8)
    fq = parse_fastq_bytes(fq_bytes)
    assert fq.num_reads == 2
    assert fq.name_bytes(0) == b"r1 c"
    assert fq.seq_bytes(1) == b"GGTTA"
    assert fq.qual_bytes(1) == b"!!!!!"


@needs_native
def test_native_fastq_malformed():
    with pytest.raises(ValueError):
        parse_fastq_bytes(b"@r1\nACGT\n+\nFFF\n")  # qual shorter
    with pytest.raises(ValueError):
        parse_fastq_bytes(b"r1\nACGT\n+\nFFFF\n")  # no @
