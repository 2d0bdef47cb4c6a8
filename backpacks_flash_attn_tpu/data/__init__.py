from . import lm_dataset
