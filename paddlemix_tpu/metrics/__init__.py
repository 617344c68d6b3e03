from .clip_zero_shot import build_zero_shot_classifier, zero_shot_accuracy
from .caption_eval import bleu, cider_d, vqa_accuracy
from .fid_clip_score import (
    clip_features,
    clip_score,
    compute_fid,
    compute_fid_clip_score,
    frechet_distance,
)
from .keypoint_score import compute_oks, keypoint_ap
