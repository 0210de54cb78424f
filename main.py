"""ER pipeline driver — `spark-submit --py-files pkg.zip main.py --tier smoke`.

Runs the full blocking → scoring → clustering pipeline on the deterministic
synthetic interleaved corpus (FIXTURES.md), evaluates pairwise F1 on
labeled pairs at shared blocking keys, and prints one JSON line of metrics
(F1, precision/recall, stage walls, manifest lineage).

Tiers: smoke (200 docs), correctness (2,000), bench (50,000) — see
FIXTURES.md scale points.  Use --n-docs to override.
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

# smoke >= 1000: below ~1000 docs the rare-token document-frequency signal
# degenerates (noise-vocab df ~ 0.024*N crosses the cluster-size ceiling 5,
# so name tokens and corpus words become inseparable and clusters over-merge)
TIERS = {"smoke": 1000, "correctness": 2000, "bench": 50000}


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--tier", choices=list(TIERS), default="smoke")
    p.add_argument("--n-docs", type=int, default=None)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--run-dir", default=None)
    p.add_argument("--cores", type=int, default=None)
    p.add_argument("--max-df", type=int, default=None)
    args = p.parse_args(argv)

    n_docs = args.n_docs or TIERS[args.tier]
    run_dir = args.run_dir or tempfile.mkdtemp(prefix=f"er_{args.tier}_")

    from liblevenshtein_rust_spark.operators import blocking
    from liblevenshtein_rust_spark.pipeline import er
    from liblevenshtein_rust_spark.session import get_spark
    from liblevenshtein_rust_spark.sources import fixtures

    spark = get_spark(f"er-{args.tier}", cores=args.cores)
    spark.sparkContext.setLogLevel("ERROR")

    cfg = er.ERConfig(max_df=args.max_df or max(10, n_docs // 150))
    docs = fixtures.generate_docs(spark, n_docs, seed=args.seed).cache()

    t0 = time.time()
    entities = er.run_pipeline(spark, docs, run_dir, cfg)
    wall = time.time() - t0

    labels = fixtures.generate_labels(docs, seed=args.seed)
    toks = blocking.rare_tokens(
        blocking.doc_tokens(docs, min_len=cfg.min_token_len), max_df=cfg.max_df
    )
    m = er.pairwise_f1(entities, labels, toks)
    rs = er.Runstate(spark, run_dir, er.asdict(cfg)).manifests()

    out = {
        "tier": args.tier,
        "n_docs": n_docs,
        "wall_s": round(wall, 3),
        "f1": round(m["f1"], 5),
        "precision": round(m["precision"], 5),
        "recall": round(m["recall"], 5),
        "blocked_fraction": round(m["blocked_fraction"], 5),
        "entities": entities.select("entity").distinct().count(),
        "run_dir": run_dir,
        "stage_wall_s": {s: man["wall_s"] for s, man in rs.items()},
    }
    print(json.dumps(out))
    return 0 if m["f1"] >= 0.99 else 1


if __name__ == "__main__":
    sys.exit(main())
