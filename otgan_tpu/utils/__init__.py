from otgan_tpu.utils.plotting import img_tile, save_tile_img, img_stretch
from otgan_tpu.utils.checkpoint import save_checkpoint, restore_checkpoint, latest_checkpoint
from otgan_tpu.utils.metrics import MetricLogger
