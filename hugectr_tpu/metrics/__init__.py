from .metrics import (
    MetricAccumulator,
    auc_score,
    hitrate_score,
    ndcg_score,
    smape_score,
)
