from . import perplexity, similarity
