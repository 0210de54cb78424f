"""Merge extra --scale-worker samples into a campaign detail file.

The scaling contract aggregates per-size MIN over all full-size passes;
extra samples of a size can only converge that size's min toward its
unthrottled truth (asymmetric host-throttle windows otherwise leave one
size's reading inflated).  Every sample, with its bracketing host probes,
stays in the artifact.

Usage: python scripts/merge_campaign.py <detail.json> <sample.json ...>
"""
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import bench

detail_path = Path(sys.argv[1])
detail = json.loads(detail_path.read_text())
# build_scaling stamps pairs_scored/n_docs from bench's module constants —
# pin them to the values RECORDED in the artifact being merged, not this
# shell's env defaults (a 24M-pair campaign merged in a default shell would
# otherwise be silently rewritten as 16M and every throughput with it)
sc = detail["scaling"]
if isinstance(sc.get("score_job"), dict) and "pairs_scored" in sc["score_job"]:
    bench.SCALE_PAIRS = sc["score_job"]["pairs_scored"]
if isinstance(sc.get("er_pipeline"), dict) and "n_docs" in sc["er_pipeline"]:
    bench.SCALE_DOCS = sc["er_pipeline"]["n_docs"]
samples: dict[int, list] = {}
for s in detail["scaling"]["samples"]:
    samples.setdefault(s["cores"], []).append(s)
for p in sys.argv[2:]:
    s = json.loads(Path(p).read_text().strip().splitlines()[-1])
    samples.setdefault(s["cores"], []).append(s)
errors = detail["scaling"].get("errors", [])
detail["scaling"] = bench.build_scaling(samples, errors)
detail["scaling"]["aggregation"] += (
    " — includes post-campaign targeted re-samples (merge_campaign.py); "
    "per-size min is sample-order-invariant"
)
detail_path.write_text(json.dumps(detail, indent=1) + "\n")
sj = detail["scaling"]["score_job"]
ep = detail["scaling"].get("er_pipeline")
print("score:", sj.get("pairs"), "er:", ep.get("pairs") if isinstance(ep, dict) else ep)
