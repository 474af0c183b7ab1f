from ranklib_tpu.metrics.base import (  # noqa: F401
    MetricScorer,
    create_scorer,
    score_dataset,
)
