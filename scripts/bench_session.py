"""One-shot on-chip bench session: run configs back to back in a single
process so the tunnel is claimed once (docs/KNOWN_ISSUES.md #7).

Keep the HOST idle while this runs: the timed region includes the native
pass-4 and the tunnel relay, both of which degrade under CPU contention.
"""
import json
import sys

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402


def report(cfg, r):
    print(json.dumps({"cfg": cfg, "rps": r["value"],
                      "compute_rps": r.get("compute_rps"),
                      "parity": r["parity"],
                      "passes": r["detail"]["pass_times_s"]}), flush=True)


r = bench.run(400_000, 150, 32, 8192)
report("prefill_wc128", r)

r = bench.run(400_000, 150, 32, 8192, walk_chunk=256)
report("prefill_wc256", r)

r = bench.run(400_000, 150, 32, 8192, walk_chunk=512)
report("prefill_wc512", r)

# full E. coli-scale config (BASELINE config 2): 1.5M reads 2x150 ~50x
r = bench.run(1_500_000, 150, 32, 8192, parity=False)
report("ecoli_full", r)
