from otgan_tpu.ops.sinkhorn import sinkhorn_log, sinkhorn_assignment
from otgan_tpu.ops.costs import cosine_cost, scaled_sqeuclidean_cost
from otgan_tpu.ops.matching import (
    match_two_batch,
    match_single_batch,
    match_random,
    calc_distance,
    MatchedFeatures,
)
from otgan_tpu.ops.losses import med_generator_loss, med_discriminator_loss
