"""Name → (model cls, config cls, loss fn) registry (meta_arch/__init__.py:7-21)."""

from __future__ import annotations

MODELS: dict[str, tuple] = {}

# The reference's ``__losses__`` registry (meta_arch/__init__.py:15-21):
# configs carry a ``loss_func`` key and tools/ft_dkt.py:117-118 dispatches
# on it. Names here mirror the reference exactly, plus ``sequence_loss_igev``
# (the IGEV loss the reference ships as an empty file).
LOSS_NAMES = (
    "sequence_loss_raft",
    "sequence_loss_igev",
    "sequence_loss_pcvnet",
    "loss_gwcnet",
    "loss_cgi",
    "ns_loss",
)

# Per-model default when a config omits ``loss_func`` (every shipped config
# carries one; the default keeps programmatic callers like __graft_entry__
# working without a config dict).
DEFAULT_LOSS = {
    "RAFTStereo": "sequence_loss_raft",
    "IGEVStereo": "sequence_loss_igev",
    "GWCNet": "loss_gwcnet",
    "CGI_Stereo": "loss_cgi",
    "PCVNet": "sequence_loss_pcvnet",
}


def register_model(name: str, model_cls, config_cls, loss_fn):
    MODELS[name] = (model_cls, config_cls, loss_fn)
    return model_cls


def get_model(name: str):
    if name not in MODELS:
        raise KeyError(f"unknown model {name!r}; registered: {sorted(MODELS)}")
    return MODELS[name]


def make_loss_adapter(name: str, cfg, loss_func: str | None = None):
    """Uniform loss interface for the DKT loop: fn(outputs_dict, flow_gt,
    valid) -> (loss, metrics, mask, ok), mirroring the reference's
    ``loss_func(results, disp_gt, valid, args=args)`` convention
    (tools/ft_dkt.py:227-228).

    ``loss_func`` selects the loss BY NAME from the reference's
    ``__losses__``-style registry (meta_arch/__init__.py:15-21,
    tools/ft_dkt.py:117-118); when None the model's default applies.
    Unknown names raise, like the reference's KeyError at :118.
    """
    from dkt_stereo_tpu.losses.cgi import loss_cgi
    from dkt_stereo_tpu.losses.gwc import loss_gwcnet
    from dkt_stereo_tpu.losses.pcv import sequence_loss_pcvnet
    from dkt_stereo_tpu.losses.sequence import sequence_loss_igev, sequence_loss_raft

    if name not in DEFAULT_LOSS:
        raise KeyError(f"unknown model {name!r}; registered: {sorted(DEFAULT_LOSS)}")
    loss_func = loss_func or DEFAULT_LOSS[name]
    if loss_func not in LOSS_NAMES:
        raise KeyError(
            f"unknown loss_func {loss_func!r}; registered: {sorted(LOSS_NAMES)}"
        )

    if loss_func == "sequence_loss_raft":
        # per-iteration L1 on disp_preds — valid for any model emitting the
        # RAFT output contract (RAFT itself; IGEV when reproducing the
        # reference's configs/igev_stereo/base.json dispatch, which ignores
        # init_disp because meta_arch/igev_stereo/loss.py is empty)
        return lambda out, gt, v: sequence_loss_raft(out["disp_preds"], gt, v)
    if loss_func == "sequence_loss_igev":
        # init_disp term included: the scan stop-grads the incoming disp, so
        # the 3D classifier / init-spx branch trains only through it
        max_disp = getattr(cfg, "max_disp", getattr(cfg, "maxdisp", 192))
        return lambda out, gt, v: sequence_loss_igev(
            out["disp_preds"], out["init_disp"], gt, v, max_disp=max_disp
        )
    if loss_func == "loss_gwcnet":
        return lambda out, gt, v: loss_gwcnet(out["disp_preds"], gt, v, cfg.maxdisp)
    if loss_func == "loss_cgi":
        return lambda out, gt, v: loss_cgi(out["disp_preds"], gt, v, cfg.maxdisp)
    if loss_func == "sequence_loss_pcvnet":
        return lambda out, gt, v: sequence_loss_pcvnet(out["output_list"], gt, v)
    # ns_loss needs the trinocular batch (conf + im0/im1/im2), not the
    # (outputs, gt, valid) contract — the reference registers it but its
    # signature is likewise incompatible with ft_dkt.py:227's call (latent
    # bug); here the NS training mode (train/ns_step.py, selected by
    # cli/train.py when loss_func == "ns_loss") consumes it properly.
    raise ValueError(
        "ns_loss requires the trinocular batch contract; select it via a "
        "config with loss_func='ns_loss' and --train_datasets nerf_stereo "
        "(cli/train.py routes that to the NeRF-Stereo training step)"
    )
