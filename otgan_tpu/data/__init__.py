from otgan_tpu.data.cifar10 import (
    load as load_cifar10,
    maybe_download_and_extract,
    DataLoader,
    random_flip,
)
from otgan_tpu.data.toy import sample_8gaussians, GAUSSIAN_CENTERS
