"""spider_ray — a from-scratch Ray-Data-native rebuild of targc/spider-go's
data-processing capabilities, grafted onto a Common-Crawl-style URL-frontier
crawl engine (see /root/repo/SURVEY.md and /root/repo/BASELINE.json).

Layout:
    common/     pure deterministic kernels shared by the oracle and the Ray
                stages (URL canonicalization, HTML text/link extraction,
                stable hashing).  NOTHING in here imports ray.
    datagen.py  deterministic synthetic pages/seeds/politeness fixtures.
    oracle/     single-threaded reference crawler defining conformance
                semantics (SURVEY.md §5).
    state/      bloom + cuckoo filters and the sharded seen-set actors.
    stages/     Ray Data map_batches stages of the crawl pipeline.
    scheduler.py per-host politeness-budget scheduling (combiner + tiny
                groupby + broadcast cutoffs — never a full-frontier shuffle).
    engine.py   the epoch BFS driver with per-epoch, per-partition
                checkpoints + lineage manifest (resumable).
    flow/       spider-go engine-conformance layer: flow specs, the
                expression mapper compiler, port-labeled dispatch, worker
                UDF registry.
    pipelines/  training-data operators over the testdata tables (dedup,
                text analysis, ANN similarity, multimodal stubs, relational
                operator coverage for the driver's DuckDB oracle).
"""

__version__ = "0.1.0"
