from . import control, perplexity, similarity
