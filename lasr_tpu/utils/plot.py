"""Attention-map visualization — port of
``lasr/modules/net/transformer/plot.py:7-61``.

Attention maps are harvested from Flax's 'intermediates' collection (every
attention module ``sow``s its post-softmax map under key ``attn``) — the
functional equivalent of the reference's ``self.attn`` buffers +
``calculate_all_attentions`` (e2e_base.py:93-111).
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np


def collect_attention_maps(intermediates: Dict) -> Dict[str, np.ndarray]:
    """Flatten a mutable-'intermediates' tree into {module_path: (B,H,L,T)}."""
    out = {}

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + (k,))
        elif isinstance(node, (tuple, list)):
            if path and path[-1] == "attn" and len(node) >= 1:
                out[".".join(path[:-1])] = np.asarray(node[0])
            else:
                for i, v in enumerate(node):
                    walk(v, path + (str(i),))

    walk(intermediates, ())
    return out


def calculate_all_attentions(model, variables, x, xlen, ys_in,
                             method=None) -> Dict[str, np.ndarray]:
    """Run a forward pass and harvest every attention map."""
    _, inter = model.apply(variables, x, xlen, ys_in,
                           mutable=["intermediates"])
    return collect_attention_maps(inter["intermediates"])


def plot_multi_head_attention(att_maps: Dict[str, np.ndarray], out_dir: str,
                              uid: str = "utt") -> None:
    """Save one PNG of per-head heatmaps per attention module
    (plot.py:35-61). Requires matplotlib (optional dependency)."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError as e:  # pragma: no cover
        raise ImportError("matplotlib is required for attention plots") from e
    os.makedirs(out_dir, exist_ok=True)
    for name, att in att_maps.items():
        a = att[0]  # first utterance: (H, L, T)
        H = a.shape[0]
        fig, axes = plt.subplots(1, H, figsize=(3 * H, 3), squeeze=False)
        for h in range(H):
            axes[0][h].imshow(a[h], aspect="auto", origin="lower")
            axes[0][h].set_title(f"head {h}")
        fig.suptitle(name)
        fig.tight_layout()
        fig.savefig(os.path.join(out_dir, f"{uid}.{name}.png"))
        plt.close(fig)
