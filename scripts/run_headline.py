"""Run the headline experiment at recorded-table scale on the real chip.

Usage: python scripts/run_headline.py [out_dir]
(defaults sized for one TPU v5e chip; see HeadlineCfg for the knobs)
"""
import json
import sys

sys.path.insert(0, "/root/repo")

from crfr.experiments.headline import HeadlineCfg, run_headline, ordering_holds

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/crfr_headline"
h = HeadlineCfg(out_dir=out)
t = run_headline(h)
print(json.dumps(t["results"], indent=1))
for p in h.probe_sizes:
    print(f"ordering@{p}:",
          ordering_holds(t, p), ordering_holds(t, p, "rank1"))
print("total_s", t["total_s"])
