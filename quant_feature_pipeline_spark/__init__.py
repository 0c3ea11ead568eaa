"""quant_feature_pipeline_spark — a from-scratch PySpark-native
point-in-time feature-engineering engine with the query/data-processing
capabilities of ``tuotuo512/quant-feature-pipeline`` (reference at
/root/reference, studied for WHAT to compute, not HOW).

Layout
------
- ``session``      SparkSession builder tuned for the target scale
- ``config``       timeframe parsing + pipeline config dataclasses
- ``sources``      deterministic synthetic token/bar generators, scans, sinks
- ``operators``    resample, as-of join, fill/backfill, shift, sessionize, dedup
- ``functions``    indicator kernels (window + recurrence), rank, normalize
- ``plans``        end-to-end pipeline assembly, checkpoint/resume, schema contract
- ``textops``      dedup (minhash/simhash/ngram), similarity search, text quality
- ``multimodal``   binary-column (image/audio) plumbing with stubbed decoders
- ``streaming``    structured-streaming wrappers for the micro-batch mode
"""

__version__ = "0.1.0"
