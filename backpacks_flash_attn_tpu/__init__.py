"""backpacks_flash_attn_tpu: a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of john-hewitt/backpacks-flash-attn — Backpack & GPT language models,
flash attention, quantized inference, tensor-parallel serving, and training.
"""

from . import config
from .config import (BackpackConfig, GPTConfig, backpack_micro, backpack_mini,
                     backpack_small, gpt2_small)

__version__ = "0.1.0"
