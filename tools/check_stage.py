"""Print the curriculum stage for an epoch (reference tools/check_stage.py)."""
import pathlib, sys
sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
import sys

from spectral_tpu.models.config import TrainConfig
from spectral_tpu.train.schedules import curriculum_cutoff, lr_stage_params

epoch = int(sys.argv[1]) if len(sys.argv) > 1 else 0
cfg = TrainConfig()
print(f"epoch {epoch}: cutoff={curriculum_cutoff(epoch, cfg, cfg.freq_bins)} "
      f"stage={lr_stage_params(epoch, cfg)[0]}")
