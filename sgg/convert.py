"""Reference-checkpoint conversion (TF1 → sgg params).

BASELINE.json:5 requires "bit-comparable triple outputs on the same
checkpoints". The converter maps a name→array dict read from a TF1
``Saver`` checkpoint onto sgg's flax param trees. Because
:class:`sgg.models.lstm.TF1LSTMCell` reproduces TF1's exact kernel layout,
gate order (i,j,f,o), and forget-bias convention, LSTM kernels/biases copy
over without any reordering — the historically error-prone part of TF1 →
JAX conversions.

NOTE [R]: the reference snapshot at /root/reference was EMPTY during the
survey (SURVEY.md §0), so the DEFAULT variable names below encode the
*expected* Show-Attend-Tell-style layout and MUST be re-verified against the
real checkpoint when the mount appears. The mapping is data, not code —
pass a custom ``mapping`` to match whatever names the real reference used.
"""

from __future__ import annotations

import re
from typing import Callable

import numpy as np


def read_tf_checkpoint(path: str) -> dict[str, np.ndarray]:
    """Read a TF1 name-based checkpoint into {var_name: ndarray}."""
    import tensorflow as tf  # host-side only [ENV]

    reader = tf.train.load_checkpoint(path)
    return {
        name: reader.get_tensor(name)
        for name in reader.get_variable_to_shape_map()
    }


# Each entry: sgg param path (tuple) → (reference var regex, transform).
# Transforms run on the raw TF array before insertion.
_T = lambda a: a.T
_ID = lambda a: a

DEFAULT_GENERATOR_MAPPING: dict[tuple[str, ...], tuple[str, Callable]] = {
    ("token_embedding",): (r"(generator/)?embedding(/weights|/w)?$", _ID),
    ("init_c", "kernel"): (r"(generator/)?init_c/(weights|kernel|w)$", _ID),
    ("init_c", "bias"): (r"(generator/)?init_c/(biases|bias|b)$", _ID),
    ("init_h", "kernel"): (r"(generator/)?init_h/(weights|kernel|w)$", _ID),
    ("init_h", "bias"): (r"(generator/)?init_h/(biases|bias|b)$", _ID),
    ("TF1LSTMCell_0", "kernel"): (
        r"(generator/)?(rnn/)?(basic_)?lstm_cell/(kernel|weights)$", _ID,
    ),
    ("TF1LSTMCell_0", "bias"): (
        r"(generator/)?(rnn/)?(basic_)?lstm_cell/(bias|biases)$", _ID,
    ),
    ("AdditiveAttention_0", "feat_proj", "kernel"): (
        r"(generator/)?att(ention)?/feat(ure)?_proj/(weights|kernel)$", _ID,
    ),
    ("AdditiveAttention_0", "state_proj", "kernel"): (
        r"(generator/)?att(ention)?/(state|h)_proj/(weights|kernel)$", _ID,
    ),
    ("AdditiveAttention_0", "state_proj", "bias"): (
        r"(generator/)?att(ention)?/(state|h)_proj/(biases|bias)$", _ID,
    ),
    ("AdditiveAttention_0", "score", "kernel"): (
        r"(generator/)?att(ention)?/(score|v)/(weights|kernel)$", _ID,
    ),
    ("deep_out", "kernel"): (r"(generator/)?deep_out(put)?/(weights|kernel)$", _ID),
    ("deep_out", "bias"): (r"(generator/)?deep_out(put)?/(biases|bias)$", _ID),
    ("vocab_proj", "kernel"): (r"(generator/)?(logits|vocab_proj|decode)/(weights|kernel)$", _ID),
    ("vocab_proj", "bias"): (r"(generator/)?(logits|vocab_proj|decode)/(biases|bias)$", _ID),
}


# Discriminator/critic mapping (sgg.models.discriminator.TripleCritic).
# Same caveat as the generator mapping: names are the *expected* TF1 layout
# ([R] — re-verify against the real checkpoint when the reference appears).
DEFAULT_DISCRIMINATOR_MAPPING: dict[tuple[str, ...], tuple[str, Callable]] = {
    ("token_embedding",): (r"(discriminator|critic)/embedding(/weights|/w)?$", _ID),
    ("query_proj", "kernel"): (
        r"(discriminator|critic)/(query|q)_proj/(weights|kernel)$", _ID,
    ),
    ("query_proj", "bias"): (
        r"(discriminator|critic)/(query|q)_proj/(biases|bias)$", _ID,
    ),
    ("key_proj", "kernel"): (
        r"(discriminator|critic)/(key|k)_proj/(weights|kernel)$", _ID,
    ),
    ("score", "kernel"): (
        r"(discriminator|critic)/(score|v)/(weights|kernel)$", _ID,
    ),
    ("trunk_0", "kernel"): (
        r"(discriminator|critic)/(trunk|fc|dense)_?0/(weights|kernel)$", _ID,
    ),
    ("trunk_0", "bias"): (
        r"(discriminator|critic)/(trunk|fc|dense)_?0/(biases|bias)$", _ID,
    ),
    ("trunk_1", "kernel"): (
        r"(discriminator|critic)/(trunk|fc|dense)_?1/(weights|kernel)$", _ID,
    ),
    ("trunk_1", "bias"): (
        r"(discriminator|critic)/(trunk|fc|dense)_?1/(biases|bias)$", _ID,
    ),
    ("trunk_2", "kernel"): (
        r"(discriminator|critic)/(trunk|fc|dense)_?2/(weights|kernel)$", _ID,
    ),
    ("trunk_2", "bias"): (
        r"(discriminator|critic)/(trunk|fc|dense)_?2/(biases|bias)$", _ID,
    ),
    ("ln_0", "scale"): (r"(discriminator|critic)/ln_?0(/LayerNorm)?/(gamma|scale)$", _ID),
    ("ln_0", "bias"): (r"(discriminator|critic)/ln_?0(/LayerNorm)?/(beta|bias)$", _ID),
    ("ln_1", "scale"): (r"(discriminator|critic)/ln_?1(/LayerNorm)?/(gamma|scale)$", _ID),
    ("ln_1", "bias"): (r"(discriminator|critic)/ln_?1(/LayerNorm)?/(beta|bias)$", _ID),
    ("ln_2", "scale"): (r"(discriminator|critic)/ln_?2(/LayerNorm)?/(gamma|scale)$", _ID),
    ("ln_2", "bias"): (r"(discriminator|critic)/ln_?2(/LayerNorm)?/(beta|bias)$", _ID),
    ("head", "kernel"): (
        r"(discriminator|critic)/(head|out(put)?)/(weights|kernel)$", _ID,
    ),
    ("head", "bias"): (
        r"(discriminator|critic)/(head|out(put)?)/(biases|bias)$", _ID,
    ),
}

# A real TF1 Saver checkpoint holds generator AND discriminator variables in
# one flat namespace; the generator patterns' optional prefix would otherwise
# also match e.g. "discriminator/embedding".
GENERATOR_EXCLUDE = r"discriminator|critic|vgg"
DISCRIMINATOR_EXCLUDE = r"generator|vgg"


def convert_from_arrays(
    tf_vars: dict[str, np.ndarray],
    target_params: dict,
    mapping: dict[tuple[str, ...], tuple[str, Callable]] | None = None,
    strict: bool = True,
    exclude: str | None = None,
) -> tuple[dict, list[str]]:
    """Place reference arrays into a copy of ``target_params``.

    ``target_params``: the (possibly nested) param dict from ``module.init``
    — shapes are validated against it. ``exclude``: regex of reference names
    to ignore (scopes the search when one checkpoint holds several nets).
    Returns (params, unmatched_paths).
    """
    import jax

    mapping = mapping or DEFAULT_GENERATOR_MAPPING
    if exclude is not None:
        ex = re.compile(exclude)
        tf_vars = {n: v for n, v in tf_vars.items() if not ex.search(n)}
    # Build a mutable nested copy to place reference arrays into.
    params = jax.tree.map(np.asarray, target_params)

    def set_path(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node[p]
        node[path[-1]] = value

    def get_path(tree, path):
        node = tree
        for p in path:
            node = node[p]
        return node

    unmatched = []
    for path, (pattern, transform) in mapping.items():
        rx = re.compile(pattern)
        hits = [n for n in tf_vars if rx.search(n)]
        try:
            tgt = get_path(params, path)
        except KeyError:
            continue  # param absent in this architecture variant
        if not hits:
            unmatched.append("/".join(path))
            continue
        if len(hits) > 1:
            raise ValueError(f"ambiguous match for {path}: {hits}")
        arr = np.asarray(transform(tf_vars[hits[0]]), dtype=np.float32)
        if arr.shape != tuple(tgt.shape):
            raise ValueError(
                f"shape mismatch for {'/'.join(path)}: reference {arr.shape} "
                f"vs target {tuple(tgt.shape)}"
            )
        set_path(params, path, arr)
    if strict and unmatched:
        raise ValueError(
            f"unmatched reference variables for params: {unmatched}; "
            "pass a custom mapping or strict=False"
        )
    import jax.numpy as jnp

    return jax.tree.map(jnp.asarray, params), unmatched


def convert_tf_checkpoint(
    ckpt_path: str, target_params: dict, mapping=None, strict: bool = True
):
    """read_tf_checkpoint + convert_from_arrays in one call."""
    return convert_from_arrays(
        read_tf_checkpoint(ckpt_path), target_params, mapping, strict
    )


def match_report(
    tf_vars: dict[str, np.ndarray],
    targets: dict[str, tuple[dict, dict, str | None]],
) -> dict:
    """Dry-run matching: which reference variable feeds which param.

    ``targets``: {net_name: (param_tree, mapping, exclude_regex)}. Returns
    {"matched": [(net/param_path, ref_name, shape)], "unmatched_params":
    [...], "ambiguous": [...], "unused_vars": [...]} — the one-command
    parity audit to run the day the reference mount appears (SURVEY.md §0).
    """
    used: set[str] = set()
    matched, unmatched, ambiguous = [], [], []
    for net, (param_tree, mapping, exclude) in targets.items():
        ex = re.compile(exclude) if exclude else None
        names = [n for n in tf_vars if ex is None or not ex.search(n)]
        for path, (pattern, _tf) in mapping.items():
            rx = re.compile(pattern)
            hits = [n for n in names if rx.search(n)]
            label = f"{net}/{'/'.join(path)}"
            if len(hits) == 1:
                matched.append((label, hits[0], tuple(tf_vars[hits[0]].shape)))
                used.add(hits[0])
            elif not hits:
                unmatched.append(label)
            else:
                ambiguous.append((label, hits))
    unused = sorted(set(tf_vars) - used)
    return {
        "matched": matched,
        "unmatched_params": unmatched,
        "ambiguous": ambiguous,
        "unused_vars": unused,
    }
