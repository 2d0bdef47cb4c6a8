from . import control, genderbias, perplexity, pplm, similarity, visualize
