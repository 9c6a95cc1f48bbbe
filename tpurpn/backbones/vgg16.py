"""VGG16 feature backbone (to block5_conv3, stride 16).

TPU-native equivalent of the reference's
``keras.applications.VGG16(include_top=False)`` tapped at ``block5_conv3``
(reference: models/rpn_vgg16.py, SURVEY.md §3.3). Built in flax.linen with:

* bf16 compute / fp32 params (MXU-friendly; XLA fuses ReLU into the convs),
* SAME 3x3 convs, VALID 2x2 max-pools — identical feature-map arithmetic to
  Keras: 500 -> 250 -> 125 -> 62 -> 31,
* Keras-compatible module names (block{i}_conv{j}) so ImageNet ``.h5`` weights
  map 1:1 through tpurpn.io_utils when available.

The classifier head and the 5th pool are never built — the RPN taps the
stride-16 feature map.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

# (block, [channels per conv]) — VGG16 through block5_conv3
_CFG = (
    (1, (64, 64)),
    (2, (128, 128)),
    (3, (256, 256, 256)),
    (4, (512, 512, 512)),
    (5, (512, 512, 512)),
)


class VGG16Backbone(nn.Module):
    """Outputs the block5_conv3 feature map: (B, H//16, W//16, 512)."""

    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        del train  # VGG16 has no normalization layers
        x = x.astype(self.dtype)
        for block, channels in _CFG:
            if block > 1:
                # VALID pool (floors odd sizes: 125 -> 62), placed at the
                # *start* of blocks 2-5 so block5_conv3 is pre-pool stride 16
                x = nn.max_pool(x, (2, 2), strides=(2, 2), padding="VALID")
            for j, ch in enumerate(channels, start=1):
                x = nn.Conv(
                    ch,
                    (3, 3),
                    padding="SAME",
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name=f"block{block}_conv{j}",
                )(x)
                x = nn.relu(x)
        return x
