"""Offset-diversity deformable fusion of the two warped references.

Parity: /root/reference/ICIP2024/src/model/helpers.py:35-69 (M20): per
reference, decoded head output (27*8 = 216 ch) splits into two 72-ch offset
halves and a 72-ch mask; offsets are tanh-bounded by a per-scale magnitude
and centered on the scaled flow; a grouped (2*8) modulated deformable conv
fuses both references' features into one compensated map.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from tpuvc.ops.deform import DeformConv

DEFORM_GROUPS = 8  # per reference; fusion uses 2 * 8


class OffsetDiversity(nn.Module):
    features: int
    magnitude: float

    def _prep(self, head, flow):
        """head: (B,H,W,216) -> (offsets (B,H,W,144), masks (B,H,W,72)).

        Offsets are (dy, dx) pairs per tap (torchvision layout, matching
        tpuvc.ops.deform): the flow is broadcast to every tap as the center
        and the tanh-bounded prediction is the diversity around it.
        """
        o1, o2, mask = jnp.split(head, 3, axis=-1)
        mask = nn.sigmoid(mask)
        offset = jnp.tanh(jnp.concatenate([o1, o2], axis=-1)) * self.magnitude
        # flow is (dx, dy); deform offsets are (dy, dx) per tap.
        flow_yx = flow[..., ::-1]
        n_taps = offset.shape[-1] // 2
        offset = offset + jnp.tile(flow_yx, (1, 1, 1, n_taps))
        return offset, mask

    @nn.compact
    def __call__(self, x1, head1, flow1, x2, head2, flow2):
        off1, m1 = self._prep(head1, flow1)
        off2, m2 = self._prep(head2, flow2)
        x = jnp.concatenate([x1, x2], axis=-1)
        offsets = jnp.concatenate([off1, off2], axis=-1)
        masks = jnp.concatenate([m1, m2], axis=-1)
        return DeformConv(
            features=self.features, groups=2 * DEFORM_GROUPS, kernel=3
        )(x, offsets, masks)
