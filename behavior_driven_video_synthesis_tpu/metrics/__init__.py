from .sequence import (
    average_pairwise_distance,
    average_self_distance,
    final_self_distance,
    average_displacement_error,
    final_displacement_error,
    sequence_sample_metrics,
)
from .ssim import ssim
from .inception_score import inception_score_from_logits
from .fid import fid_from_features, gaussian_stats
