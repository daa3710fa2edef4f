from otgan_tpu.eval.inception import (
    get_inception_score,
    inception_score_from_preds,
    inception_score_from_sampler,
)
