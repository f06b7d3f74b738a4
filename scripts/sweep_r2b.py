"""Round-2 continuation sweep: overlap changes + walk width, ONE process
(tunnel quirk: avoid process churn).  Full 400k bench, parity-gated
(golden is disk-cached)."""
import json
import sys

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402

for wc in (None, 256, 512):
    r = bench.run(num_reads=400_000, read_len=150, k=32, batch_size=8192,
                  parity=True, walk_chunk=wc)
    print(json.dumps({"walk_chunk": wc, "rps": r["value"],
                      "parity": r.get("parity"),
                      "pass_times": r["detail"]["pass_times_s"]}),
          flush=True)
