import json, sys
sys.path.insert(0, "/root/repo")
import bench
for wc in (1024, 768):
    r = bench.run(num_reads=400_000, read_len=150, k=32, batch_size=8192,
                  parity=True, walk_chunk=wc)
    print(json.dumps({"walk_chunk": wc, "rps": r["value"],
                      "parity": r.get("parity"),
                      "pass_times": {k: v for k, v in
                                     r["detail"]["pass_times_s"].items()
                                     if not isinstance(v, list)}}),
          flush=True)
