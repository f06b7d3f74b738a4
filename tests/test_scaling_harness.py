"""bench_scaling.py: the BASELINE measurement-point harness must run on
the virtual 8-device CPU mesh, emit the point schema, and parity-gate
every device count against the 1-device output (SURVEY.md H5)."""

import importlib.util
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load():
    spec = importlib.util.spec_from_file_location(
        "bench_scaling", os.path.join(ROOT, "bench_scaling.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_points_schema_and_parity():
    mod = _load()
    res = mod.run_points(num_reads=2000, read_len=60, k=16,
                         batch_size=256, devices_list=[1, 2, 8],
                         repeats=1)
    assert res["metric"] == "scaling_points"
    pts = res["points"]
    assert [p["devices"] for p in pts] == [1, 2, 8]
    for p in pts:
        assert p["parity_vs_1dev"] is True
        assert p["reads_per_sec_per_chip"] > 0
        assert "efficiency_vs_1chip" in p
