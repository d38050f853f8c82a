"""BERT-style weight initializers (reference modules/weights.py:3-20).

The reference applies ``_init_weights_bert`` (normal std=0.02 for Linear and
Embedding, zeros bias, unit LayerNorm) via ``module.apply``; here the same
scheme is expressed as flax initializers passed at construction time.
"""

import jax.nn.initializers as init

BERT_STD = 0.02

bert_linear_kernel_init = init.normal(stddev=BERT_STD)
bert_embed_init = init.normal(stddev=BERT_STD)
zeros_init = init.zeros
ones_init = init.ones
