"""Conv2d subsampling frontends (Flax).

Behavioral ports of ``lasr/modules/net/transformer/subsampling.py``: stacks
of stride-2 (or 3) VALID 3x3 convs over (time, freq) followed by a linear
projection and positional encoding.  The reference's mask-slicing semantics
(``mask[:, :-2:2]`` per stride-2 conv) define the output length contract;
``subsampled_len`` reproduces it exactly for traced lengths.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from lasr_tpu.modules.embedding import PositionalEncoding


class _FreqChanDense(nn.Module):
    """The post-conv projection, taking (B, T', F', C) directly.

    Parameter tree/shape/init are identical to the ``nn.Dense`` applied to
    the reference's ``transpose(1,2).flatten`` input (subsampling.py:45-47:
    torch flattens channel-major, so kernel rows are ordered (c, f)), but
    the (F', C) contraction happens inside one dot_general — the 3x bigger
    activation is never transposed/flattened in HBM, only the small kernel
    is reshaped (on TPU this removes ~2.5 ms/step of relayout copies).
    """

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h):
        B, Tp, Fp, C = h.shape
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (C * Fp, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        h, kernel, bias = nn.dtypes.promote_dtype(h, kernel, bias,
                                                  dtype=self.dtype)
        out = jnp.einsum("btfc,cfo->bto", h, kernel.reshape(C, Fp,
                                                            self.features))
        return out + bias


def conv_out_T(T: int, kernel: int, stride: int) -> int:
    """Static output length of a VALID conv along time."""
    return (T - kernel) // stride + 1


def subsampled_len(length, T: int, kernel: int = 3, stride: int = 2,
                   solo: bool = False):
    """Valid output count under the reference's mask-slice convention.

    ``mask[:, :-(kernel-1):stride]`` keeps positions 0, s, 2s, ... up to
    T-kernel; a position j is valid iff j < length.  Works on ints or traced
    arrays.

    ``solo=True`` instead reproduces the length the reference produces when
    the utterance is encoded ALONE (T == length): the per-row cap is
    ``length - (kernel-1)`` rather than the batch-wide ``T - (kernel-1)``.
    The reference's decode driver feeds utterances one at a time
    (decode_lighting.py:129, ctc_att_decoder.py:163-165), so batched decode
    must use this convention — under the batch convention rows shorter than
    the bucket gain 1-2 trailing frames whose conv taps read padding.
    """
    if solo:
        capped = length - (kernel - 1)
        capped = jnp.maximum(capped, 0) if not isinstance(length, int) \
            else max(capped, 0)
    else:
        capped = jnp.minimum(length, T - (kernel - 1)) \
            if not isinstance(length, int) else min(length, T - (kernel - 1))
    return (capped + stride - 1) // stride


class Conv2dSubsampling(nn.Module):
    """T → T/4 (two stride-2 3x3 convs), reference subsampling.py:14-74."""

    idim: int
    odim: int
    dropout_rate: float = 0.1
    pos_enc: Optional[nn.Module] = None
    dtype: jnp.dtype = jnp.float32

    # (kernel, stride) per conv stage; subclass-style variants change this
    stages = ((3, 2), (3, 2))

    @nn.compact
    def __call__(self, x, x_len, offset=0, deterministic: bool = True,
                 solo_len: bool = False):
        """x: (B, T, idim) → ((B, T', odim) or tuple with pos_emb, (B,) T'len).

        ``solo_len``: compute per-row lengths as if each row were encoded
        alone (decode-time semantics; see ``subsampled_len``)."""
        h = x[..., None].astype(self.dtype)  # (B, T, F, 1) NHWC
        T = x.shape[1]
        new_len = x_len
        for kernel, stride in self.stages:
            h = nn.Conv(self.odim, kernel_size=(kernel, kernel),
                        strides=(stride, stride), padding="VALID",
                        dtype=self.dtype)(h)
            h = nn.relu(h)
            new_len = subsampled_len(new_len, T, kernel, stride, solo=solo_len)
            T = conv_out_T(T, kernel, stride)
        h = _FreqChanDense(self.odim, dtype=self.dtype, name="Dense_0")(h)
        pos_enc = self.pos_enc
        if pos_enc is None:
            pos_enc = PositionalEncoding(self.odim, self.dropout_rate,
                                         dtype=self.dtype)
        out = pos_enc(h, offset=offset, deterministic=deterministic) \
            if not _returns_tuple(pos_enc) else pos_enc(h, deterministic=deterministic)
        return out, new_len


def _returns_tuple(pos_enc) -> bool:
    """RelPositionalEncoding returns (x, pos_emb) and takes no offset."""
    from lasr_tpu.modules.embedding import RelPositionalEncoding
    return isinstance(pos_enc, RelPositionalEncoding)


class Conv2dUpsampling(nn.Module):
    """Transpose-conv inverse of Conv2dSubsampling (subsampling.py:175-214):
    T/4 → ~T with the frequency dim padded back to idim via output padding
    chosen by idim % 4."""

    idim: int
    odim: int
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        """x: (B, T', odim) → (B, ~4T', idim)."""
        middle = ((self.idim - 1) // 2 - 1) // 2
        B, T, _ = x.shape
        h = nn.Dense(self.odim * middle, dtype=self.dtype)(x)
        h = h.reshape(B, T, middle, self.odim)  # NHWC (time, freq, chan)
        h = nn.relu(h)
        h = nn.ConvTranspose(self.odim, (3, 3), strides=(2, 2),
                             padding="VALID", dtype=self.dtype)(h)
        h = nn.relu(h)
        h = nn.ConvTranspose(1, (3, 3), strides=(2, 2), padding="VALID",
                             dtype=self.dtype)(h)
        h = h[..., 0]  # (B, T'', F'')
        # pad/trim frequency back to idim (reference's output_padding table)
        F = h.shape[-1]
        if F < self.idim:
            h = jnp.pad(h, ((0, 0), (0, 0), (0, self.idim - F)))
        else:
            h = h[..., : self.idim]
        return h


class Conv2dSubsampling6(Conv2dSubsampling):
    """T → T/6 (stride-2 k3 then stride-3 k5), reference subsampling.py:77-122."""
    stages = ((3, 2), (5, 3))


class Conv2dSubsampling8(Conv2dSubsampling):
    """T → T/8 (three stride-2 k3), reference subsampling.py:125-172."""
    stages = ((3, 2), (3, 2), (3, 2))
