"""LSTM stack and stepwise RNN language model (Flax).

Ports of ``lasr/modules/net/rnn/lstm.py``: ``LSTMStack`` (batch-first
multi-layer LSTM, optional bidirectional) and ``RNNCellStack`` — the RNNLM
whose stepwise ``forward(state, x)`` / ``forward_onehot`` is the
``rnnlm.predict`` interface consumed by the decoders (lstm.py:58-138).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class LSTMStack(nn.Module):
    input_size: int
    hidden_size: int
    num_layers: int
    dropout: float = 0.0
    bidirectional: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        """x: (B, T, input_size) → (B, T, hidden [×2 if bi])."""
        h = x
        for i in range(self.num_layers):
            fwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden_size), name=f"fwd_{i}")
            if self.bidirectional:
                bwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden_size),
                             reverse=True, keep_order=True, name=f"bwd_{i}")
                h = jnp.concatenate([fwd(h), bwd(h)], axis=-1)
            else:
                h = fwd(h)
            if i + 1 < self.num_layers and self.dropout > 0:
                h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return h


class RNNCellStack(nn.Module):
    """Stepwise RNN LM over LSTM/GRU cells (lstm.py:58-138)."""

    input_dim: int
    output_dim: int
    n_layers: int
    n_units: int
    typ: str = "lstm"
    input_layer: str = "embed"
    dropout_rate: float = 0.5
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        if self.input_layer == "embed":
            self.embed = nn.Embed(self.input_dim, self.n_units,
                                  dtype=self.dtype)
        else:
            self.embed = nn.Dense(self.n_units, dtype=self.dtype)
        cell = nn.OptimizedLSTMCell if self.typ == "lstm" else nn.GRUCell
        self.cells = [cell(self.n_units, name=f"cell_{i}")
                      for i in range(self.n_layers)]
        self.dropouts = [nn.Dropout(self.dropout_rate)
                         for _ in range(self.n_layers + 1)]
        self.lo = nn.Dense(self.output_dim, dtype=self.dtype)

    def zero_state(self, batch: int):
        states = []
        for _ in range(self.n_layers):
            h = jnp.zeros((batch, self.n_units), self.dtype)
            if self.typ == "lstm":
                states.append((h, h))  # (c, h) flax LSTM carry
            else:
                states.append(h)
        return tuple(states)

    def __call__(self, state, x, deterministic: bool = True):
        """One step: x (B,) token ids (or (B, D) when input_layer='linear').
        Returns (new_state, logits (B, output_dim))."""
        if state is None:
            state = self.zero_state(x.shape[0])
        h = self.embed(x)
        new_state = []
        for i, cell in enumerate(self.cells):
            h = self.dropouts[i](h, deterministic=deterministic)
            carry, h = cell(state[i], h)
            new_state.append(carry)
        h = self.dropouts[-1](h, deterministic=deterministic)
        return tuple(new_state), self.lo(h)

    def forward_onehot(self, state, x, deterministic: bool = True):
        """x: (B, V) soft one-hot over the embedding table."""
        if state is None:
            state = self.zero_state(x.shape[0])
        table = self.embed.embedding if self.input_layer == "embed" else None
        h = x @ table
        new_state = []
        for i, cell in enumerate(self.cells):
            h = self.dropouts[i](h, deterministic=deterministic)
            carry, h = cell(state[i], h)
            new_state.append(carry)
        h = self.dropouts[-1](h, deterministic=deterministic)
        return tuple(new_state), self.lo(h)

    def score_sequence(self, tokens, deterministic: bool = True):
        """Teacher-forced LM logits over a whole (B, L) id sequence."""
        B, L = tokens.shape

        def step(state, x_t):
            state, y = self(state, x_t, deterministic=deterministic)
            return state, y

        state = self.zero_state(B)
        _, ys = jax.lax.scan(step, state, jnp.moveaxis(tokens, 1, 0))
        return jnp.moveaxis(ys, 0, 1)  # (B, L, V)


class RNNLM:
    """Host wrapper exposing the decoders' ``predict`` contract:
    ``state, log_probs = lm.predict(tokens, state)``."""

    def __init__(self, module: RNNCellStack, variables):
        self.module = module
        self.variables = variables

    def predict(self, tokens, state):
        new_state, logits = self.module.apply(self.variables, state,
                                              jnp.asarray(tokens))
        return new_state, jax.nn.log_softmax(logits, axis=-1)
