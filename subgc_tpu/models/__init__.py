"""Model factory (the reference's `models.setup(opt)`, models/__init__.py:43-59).

``setup`` builds the parameter pytree for a config, loading GloVe class
embeddings when the data paths provide them, and optionally restoring from a
checkpoint directory (with optimistic/vocab-remapped transfer)."""
from __future__ import annotations

import os
from typing import Optional

import numpy as np


def setup(mcfg, dcfg=None, rng=None, start_from: Optional[str] = None,
          word_mapping: Optional[np.ndarray] = None):
    """Returns (params, state)."""
    import jax

    from ..io.glove import class_embeddings
    from .params import init_params

    rng = rng if rng is not None else jax.random.PRNGKey(2019)
    obj_vecs = rel_vecs = None
    n_obj = mcfg.num_obj_classes
    n_rel = mcfg.num_rel_classes
    if dcfg is not None and os.path.exists(dcfg.obj_name_path):
        obj_names = np.load(dcfg.obj_name_path, allow_pickle=True,
                            encoding="latin1")
        rel_names = np.load(dcfg.rel_name_path, allow_pickle=True,
                            encoding="latin1")
        n_obj, n_rel = len(obj_names), len(rel_names)
        if os.path.exists(dcfg.glove_path):
            obj_vecs = class_embeddings(list(obj_names), dcfg.glove_path,
                                        mcfg.embed_dim)
            rel_vecs = class_embeddings(list(rel_names), dcfg.glove_path,
                                        mcfg.embed_dim)
    params, state = init_params(rng, mcfg, obj_glove=obj_vecs,
                                pred_glove=rel_vecs, n_obj_names=n_obj,
                                n_pred_names=n_rel)
    if start_from:
        import jax.numpy as jnp

        from ..train import checkpoint as C
        loaded, lstate, _, _, _ = C.load_checkpoint(start_from)
        params = C.optimistic_restore(jax.device_get(params), loaded,
                                      word_mapping=word_mapping)
        params = jax.tree_util.tree_map(jnp.asarray, params)
        state = jax.tree_util.tree_map(jnp.asarray, lstate)
    return params, state
