"""Walk-width sweep in ONE process (tunnel quirk: avoid process churn)."""
import json
import sys

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402

import ast
widths = ast.literal_eval(sys.argv[1]) if len(sys.argv) > 1 else (256,)
for wc in widths:
    r = bench.run(num_reads=50_000, read_len=150, k=32, batch_size=8192,
                  parity=False, walk_chunk=wc)
    print(json.dumps({"walk_chunk": wc, "rps": r["value"],
                      "pass_times": r["detail"]["pass_times_s"]}),
          flush=True)
