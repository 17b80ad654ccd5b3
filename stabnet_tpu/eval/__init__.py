from stabnet_tpu.eval.metrics import (
    cropping_score,
    distortion_score,
    evaluate_clip,
    fit_homographies,
    score_stabilized_clip,
    stability_score,
)

__all__ = [
    "cropping_score",
    "distortion_score",
    "evaluate_clip",
    "fit_homographies",
    "score_stabilized_clip",
    "stability_score",
]
