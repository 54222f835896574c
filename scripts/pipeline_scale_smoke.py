"""Scale smoke for the heavy LLM-pipeline operators at 100k docs /
100k x 64 embeddings (20x the sf0.1 gate): synthesize a corpus with
injected exact dups (~5%), near-dups (~5%) and embedding twins, then run
the end-to-end dedup chain, MinHash pairs, SemDeDup, k-NN join, epoch
mixing and entropy, asserting the invariants each op's gate pins at
small scale still hold."""

import sys
import time

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
import pyspark.sql.functions as F  # noqa: E402

from probe_spark.session import get_spark  # noqa: E402

N = 100_000
DIM = 64
SF = "/tmp/pipeline_smoke_sf"
VOCAB = (
    "key agg row scan slow fast table value part hash merge batch spark "
    "join window sort column query line customer order data group big "
    "small filter the a stream vector"
).split()

rng = np.random.default_rng(42)
lens = rng.integers(60, 140, size=N)
texts = [
    " ".join(rng.choice(VOCAB, size=ln).tolist()) for ln in lens
]
# exact dups: docs [i, i+1) ranges copying an earlier doc
for i in range(0, N, 20):  # 5%
    if i + 1 < N:
        texts[i + 1] = texts[i]
# near dups: copy + perturb one word
for i in range(10, N, 20):  # 5%
    if i + 1 < N:
        w = texts[i].split()
        w[len(w) // 2] = "perturb"
        texts[i + 1] = " ".join(w)

pdf = pd.DataFrame(
    {
        "doc_id": np.arange(N, dtype=np.int64),
        "text": texts,
        "lang": [("en", "de", "fr", "es")[i % 4] for i in range(N)],
        "source": [f"src{i % 20}" for i in range(N)],
        "n_chars": [len(t) for t in texts],
    }
)
emb = rng.standard_normal((N, DIM)).astype(np.float32)
emb[1::2] = emb[0::2] + 0.001 * rng.standard_normal(
    (N // 2, DIM)
).astype(np.float32)  # every odd vector is a near-twin of the even before it
epdf = pd.DataFrame(
    {"vec_id": np.arange(N, dtype=np.int64), "embedding": list(emb)}
)

spark = get_spark("pipeline_smoke")
spark.sparkContext.setLogLevel("ERROR")
spark.createDataFrame(pdf).repartition(32).write.mode("overwrite").parquet(
    f"{SF}/documents.parquet"
)
spark.createDataFrame(epdf).repartition(32).write.mode("overwrite").parquet(
    f"{SF}/embeddings.parquet"
)

from probe_spark.entry_queries import (  # noqa: E402
    dedup_minhash_pairs,
    dedup_semantic,
    pipeline_dedup_corpus,
    sample_epoch_mix,
    sim_knn_join,
    text_entropy,
)


def run(name, fn, check):
    t0 = time.time()
    df = fn(spark, SF)
    rows = df.count()
    el = time.time() - t0
    extra = check(df) if check else ""
    print(f"{name:24s} {el:7.1f}s rows={rows} {extra}")
    return df


ent = run(
    "text_entropy",
    text_entropy,
    lambda df: f"mean_H={df.agg(F.avg('entropy_nats')).collect()[0][0]:.3f}",
)
assert ent.count() == N

mix = run(
    "sample_epoch_mix",
    sample_epoch_mix,
    lambda df: f"copies/doc={df.count() / N:.3f}",
)
assert mix.count() > N  # net upsampling on the 20-source weight draw

mh = run(
    "dedup_minhash_pairs",
    dedup_minhash_pairs,
    lambda df: f"pairs_j1={df.filter(F.col('jaccard') >= 0.999).count()}",
)
# every injected exact dup (5% of docs, doc i+1 copying doc i) must be
# recovered as a jaccard-1 pair
assert mh.filter(F.col("jaccard") >= 0.999).count() == N // 20

from probe_spark.entry_queries import (  # noqa: E402
    _emb,
    ivf_topk,
    semantic_dedup,
)

sd = run(
    "dedup_semantic(k=64)",
    lambda s, sf: semantic_dedup(
        s, _emb(s, sf), k_cells=64, iters=2, cache_key=sf
    ),
    lambda df: f"dropped={df.filter(~F.col('kept')).count()}",
)
assert sd.count() == N  # one verdict row per vector
assert 0 < sd.filter(~F.col("kept")).count() < N

sd256 = run(
    "dedup_semantic(k=256)",
    lambda s, sf: semantic_dedup(
        s, _emb(s, sf), k_cells=256, iters=2, cache_key=sf + "#k256"
    ),
    lambda df: f"dropped={df.filter(~F.col('kept')).count()}",
)
assert sd256.count() == N

ivf = run(
    "ivf_topk(k=64,probe=8)",
    lambda s, sf: ivf_topk(
        s, _emb(s, sf), k_cells=64, nprobe=8, topk=5, iters=2,
        cache_key=sf + "#ivf64",
    ),
    lambda df: f"top={[(r['vec_id'], round(r['cos'], 3)) for r in df.collect()][:3]}",
)
ivf_rows = ivf.collect()
assert len(ivf_rows) == 5
# vec 1 is the injected near-twin of the query (vec 0): it must rank top
assert ivf_rows[0]["vec_id"] == 1 and ivf_rows[0]["cos"] > 0.99

knn = run("sim_knn_join", sim_knn_join, None)
assert knn.count() > 0

pdc = run(
    "pipeline_dedup_corpus",
    pipeline_dedup_corpus,
    lambda df: f"cols={df.columns[:4]}",
)
surv = pdc.count()
# exact + near dups collapse and the quality filter trims: strictly
# fewer survivors than raw docs, but the corpus is not emptied
assert 0 < surv < N
print("PIPELINE SCALE SMOKE OK")
