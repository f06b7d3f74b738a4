"""One-process bench session (tunnel quirk: batch TPU work, no churn).

Keep the HOST idle while this runs: the timed region includes the native
pass-4 and the tunnel relay, both of which degrade under CPU contention.
"""
import json
import sys

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402


def report(cfg, r):
    print(json.dumps({"cfg": cfg, "rps": r["value"], "parity": r["parity"],
                      "passes": r["detail"]["pass_times_s"]}), flush=True)


r = bench.run(400_000, 150, 32, 8192, walk_chunk=128)
report("wc128", r)

r = bench.run(400_000, 150, 32, 8192, walk_chunk=64)
report("wc64", r)

r = bench.run(400_000, 150, 32, 16384, walk_chunk=128)
report("b16k_wc128", r)
