from .lambda_rank import lambda_mrr_loss, bweight_lambda_mrr_loss
from .ranknet import ranknet_loss
from .lambda_loss import (
    lambda_loss,
    ndcgLoss1_scheme,
    ndcgLoss2_scheme,
    lambdaRank_scheme,
    ndcgLoss2PP_scheme,
    rankNet_scheme,
    rankNetWeightedByGTDiff_scheme,
    rankNetWeightedByGTDiffPowed_scheme,
)
from .margin_mse import margin_mse_loss
from .kl_div import kl_div_loss
from .weighted_pointwise import weighted_pointwise_loss

__all__ = [
    "lambda_mrr_loss",
    "bweight_lambda_mrr_loss",
    "ranknet_loss",
    "lambda_loss",
    "margin_mse_loss",
    "kl_div_loss",
    "weighted_pointwise_loss",
    "ndcgLoss1_scheme",
    "ndcgLoss2_scheme",
    "lambdaRank_scheme",
    "ndcgLoss2PP_scheme",
    "rankNet_scheme",
    "rankNetWeightedByGTDiff_scheme",
    "rankNetWeightedByGTDiffPowed_scheme",
]
