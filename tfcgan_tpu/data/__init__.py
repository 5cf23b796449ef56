"""Data pipeline.

Host side does only decode + pair-split + bicubic resize (PIL, matching the
reference's ``datasets_temp.py:51-63`` semantics); everything mathematical —
normalization, temperature LUT, patch crops, augmentation — runs on device
inside the jitted step. Batches are plain dicts of numpy arrays.
"""

from tfcgan_tpu.data.pairs import PairedImageDataset, batch_iterator, load_pair
from tfcgan_tpu.data.synth import synthetic_batch, synthetic_iterator
from tfcgan_tpu.data.mixture import BalancedMixture
