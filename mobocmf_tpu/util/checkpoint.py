"""Checkpoint / resume via orbax.

Replaces the reference's dill object pickles (util.py:14-25 and the
store_models_in_disk machinery in the toy example): a checkpoint is an
explicit pytree of {model params/consts, training data, thresholds, Pareto
solution, PRNG key} rather than a pickled object graph — no eval/train
dances, loader-nulling, or deepcopy hacks needed (cf.
blackbox_mfdgp_fitter.py:37,350-354,370-397).

Plain pickle of fitters also works (everything is arrays + NamedTuples);
orbax is the durable format for long BO campaigns.
"""

from __future__ import annotations

import inspect
import os
import warnings

import jax
import numpy as np


def _tree_to_numpy(tree):
    return jax.tree.map(lambda a: np.asarray(a), tree)


def save_fitter(path: str, fitter) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    state = {
        "obj_params": [_tree_to_numpy(fitter.models_objs[n].params) for n in fitter.obj_names],
        "obj_consts": [_tree_to_numpy(fitter.models_objs[n].consts) for n in fitter.obj_names],
        "con_params": [_tree_to_numpy(fitter.models_cons[n].params) for n in fitter.con_names],
        "con_consts": [_tree_to_numpy(fitter.models_cons[n].consts) for n in fitter.con_names],
        "x_train": np.asarray(fitter.x_train),
        "fidelities": np.asarray(fitter.fidelities),
        "ys_objs": [np.asarray(y) for y in fitter.ys_objs],
        "ys_cons": [np.asarray(y) for y in fitter.ys_cons],
        "key": np.asarray(jax.random.key_data(fitter.key)),
        "row_weights": np.asarray(fitter.row_weights),
    }
    meta = {
        "num_real": int(fitter.num_real),
        "pad_data": bool(fitter.pad_data),
        "obj_names": list(fitter.obj_names),
        "con_names": list(fitter.con_names),
        "thresholds_cons": list(map(float, fitter.thresholds_cons)),
        "num_fidelities": fitter.num_fidelities,
        "batch_size": fitter.batch_size,
        "models_uncond_trained": fitter.models_uncond_trained,
        # training/sampling hyperparameters: the checkpoint carries the full
        # schedule so a restored fitter (re)trains/samples exactly as the
        # campaign configured it — no manual re-application by the caller
        "hyper": {
            "lr_1": float(fitter.lr_1),
            "lr_2": float(fitter.lr_2),
            "num_epochs_1": int(fitter.num_epochs_1),
            "num_epochs_2": int(fitter.num_epochs_2),
            "pareto_set_size": int(fitter.pareto_set_size),
            "opt_grid_size": int(fitter.opt_grid_size),
            "eps": float(fitter.eps),
            "polish": str(fitter.polish),
            "whitened": bool(fitter.whitened),
            "whitened_init": str(fitter.whitened_init),
            "type_lengthscale": fitter.type_lengthscale.name,
        },
        "config": [fitter.models_objs[fitter.obj_names[0]].config._asdict()]
        if fitter.obj_names
        else [],
    }
    if fitter.pareto_solution is not None:
        state["pareto_set"] = np.asarray(fitter.pareto_solution.pareto_set)
        state["pareto_front"] = np.asarray(fitter.pareto_solution.pareto_front)
        state["pareto_mask"] = np.asarray(fitter.pareto_solution.mask)
        meta["pareto_num_valid"] = fitter.pareto_solution.num_valid

    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.join(path, "state"), {"state": state, "meta": meta}, force=True)


def restore_fitter(path: str, fitter_cls=None):
    """Restore into a fresh BlackBoxMFDGPFitter (structure rebuilt from meta)."""
    import orbax.checkpoint as ocp

    from mobocmf_tpu.fit.fitter import BlackBoxMFDGPFitter
    from mobocmf_tpu.models import mfdgp as M
    from mobocmf_tpu.moop.moop import ParetoSolution

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(os.path.join(path, "state"))
    state, meta = restored["state"], restored["meta"]

    hyper = dict(meta.get("hyper", {}))
    if "type_lengthscale" in hyper:
        from mobocmf_tpu.models.mfdgp import TL

        hyper["type_lengthscale"] = TL[str(hyper["type_lengthscale"])]
    for k in ("num_epochs_1", "num_epochs_2", "pareto_set_size", "opt_grid_size"):
        if k in hyper:
            hyper[k] = int(hyper[k])
    cls = fitter_cls or BlackBoxMFDGPFitter
    # a fitter_cls override (or a future renamed constructor arg) must not
    # make new-format checkpoints unrestorable: drop unknown hyper keys
    # with a warning instead of raising TypeError. A **kwargs constructor
    # (the standard 'def __init__(self, *a, **kw)' subclass pattern) accepts
    # everything — filtering against its literal parameter names would
    # silently drop ALL saved hyperparameters.
    sig_params = inspect.signature(cls.__init__).parameters
    accepts_var_kw = any(
        p.kind is inspect.Parameter.VAR_KEYWORD for p in sig_params.values()
    )
    accepted = set(sig_params)
    unknown = [] if accepts_var_kw else [k for k in hyper if k not in accepted]
    if unknown:
        warnings.warn(
            f"restore_fitter: dropping saved hyperparameters not accepted by "
            f"{cls.__name__}.__init__: {sorted(unknown)}"
        )
        hyper = {k: v for k, v in hyper.items() if k in accepted}
    fitter = cls(
        num_fidelities=int(meta["num_fidelities"]),
        batch_size=int(meta["batch_size"]),
        **hyper,
    )
    fitter.obj_names = list(meta["obj_names"])
    fitter.con_names = list(meta["con_names"])
    fitter.thresholds_cons = list(meta["thresholds_cons"])
    fitter.models_uncond_trained = bool(meta["models_uncond_trained"])
    fitter.x_train = jax.numpy.asarray(state["x_train"])
    fitter._x_np = np.asarray(state["x_train"])
    fitter.fidelities = jax.numpy.asarray(state["fidelities"])
    if "row_weights" in state:
        fitter.row_weights = jax.numpy.asarray(state["row_weights"])
        fitter.num_real = int(meta["num_real"])
        fitter.pad_data = bool(meta["pad_data"])
    else:  # older checkpoints: unpadded semantics
        fitter.row_weights = jax.numpy.ones(
            (fitter.x_train.shape[0],), dtype=fitter.x_train.dtype
        )
        fitter.num_real = fitter.x_train.shape[0]
    fitter.ys_objs = [jax.numpy.asarray(y) for y in state["ys_objs"]]
    fitter.ys_cons = [jax.numpy.asarray(y) for y in state["ys_cons"]]
    fitter.key = jax.random.wrap_key_data(jax.numpy.asarray(state["key"]))
    fitter.num_obj = len(fitter.obj_names)
    fitter.num_con = len(fitter.con_names)

    config = M.MFDGPConfig(**meta["config"][0]) if meta["config"] else None

    def rebuild(params_np, consts_np):
        params = jax.tree.map(jax.numpy.asarray, params_np)
        consts = jax.tree.map(jax.numpy.asarray, consts_np)
        # restore NamedTuple structure (orbax returns plain containers)
        params = M.MFDGPParams(
            layers=tuple(
                M.MFDGPLayerParams(
                    kernel=l["kernel"],
                    variational=__import__(
                        "mobocmf_tpu.models.svgp", fromlist=["SVGPVariational"]
                    ).SVGPVariational(**l["variational"]),
                )
                for l in params["layers"]
            ),
            raw_noises=params["raw_noises"],
        )
        consts = M.MFDGPConsts(
            z_x=tuple(consts["z_x"]),
            acq_eps=consts["acq_eps"],
            noise_lower=consts["noise_lower"],
            noise_upper=consts["noise_upper"],
        )
        return M.MFDGPModel(params=params, consts=consts, config=config)

    for i, n in enumerate(fitter.obj_names):
        fitter.models_objs[n] = rebuild(state["obj_params"][i], state["obj_consts"][i])
    for i, n in enumerate(fitter.con_names):
        fitter.models_cons[n] = rebuild(state["con_params"][i], state["con_consts"][i])

    if "pareto_set" in state:
        fitter.pareto_solution = ParetoSolution(
            pareto_set=jax.numpy.asarray(state["pareto_set"]),
            pareto_front=jax.numpy.asarray(state["pareto_front"]),
            mask=jax.numpy.asarray(state["pareto_mask"]),
            num_valid=int(meta["pareto_num_valid"]),
        )
    return fitter
