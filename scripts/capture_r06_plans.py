"""Capture .explain('formatted') before/after plans for round-6 targets.

Usage: python scripts/capture_r06_plans.py before|after q1,q2,...
Writes plans/r06/<query>_<tag>.txt. Plan-only (no execution) for pure
queries; streaming/lake queries that build state on construction are
skipped here and documented via their operator-level plans instead.
"""
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

tag = sys.argv[1]
only = sys.argv[2].split(",") if len(sys.argv) > 2 else None

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))

from oplogtoredis_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entry  # noqa: E402

spark = get_spark("r06-plans", master=f"local[{CPUS}]", shuffle_partitions=128)
spark.sparkContext.setLogLevel("ERROR")

# pure (non-state-building) targets whose plan is capturable without a run
DEFAULT = [
    "embedding_dup_pairs",
    "semdedup_keep",
    "envelope_decode",
    "publications",
    "ann_lsh_topk",
    "simhash_dup_pairs",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "quality_filter",
    "lm_perplexity_docs",
    "corpus_hygiene_report",
    "bm25_topk_docs",
    "decontaminate_ngram",
    "doc_repetition",
    "cluster_balanced_sample",
    "embedding_clusters",
    "ann_ivf_topk",
    "ann_quantized_topk",
    "ann_ivf_quantized_topk",
    "fuzzy_dedup_pipeline",
    "editdist_dup_pairs",
    "props_field_histogram",
    "table_profile_events",
    "pagerank_user_graph",
]

qmap = entry.queries()
os.makedirs("plans/r06", exist_ok=True)
for name in only or DEFAULT:
    df = qmap[name](spark, SF_DIR)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    with open(f"plans/r06/{name}_{tag}.txt", "w") as f:
        f.write(buf.getvalue())
    print(name, "->", f"plans/r06/{name}_{tag}.txt")
spark.stop()
