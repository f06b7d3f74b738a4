import json, os, sys
sys.path.insert(0, "/root/repo")
import bench
r = bench.run(num_reads=400_000, read_len=150, k=32, batch_size=8192,
              parity=True, walk_chunk=None)
print(json.dumps({"skip_cols": os.environ.get("KBBQ_SKIP_COLS", "16"),
                  "rps": r["value"], "parity": r.get("parity"),
                  "pass_times": {k: v for k, v in
                                 r["detail"]["pass_times_s"].items()
                                 if not isinstance(v, list)}}), flush=True)
