"""Name → (model cls, config cls, loss fn) registry (meta_arch/__init__.py:7-21)."""

from __future__ import annotations

MODELS: dict[str, tuple] = {}


def register_model(name: str, model_cls, config_cls, loss_fn):
    MODELS[name] = (model_cls, config_cls, loss_fn)
    return model_cls


def get_model(name: str):
    if name not in MODELS:
        raise KeyError(f"unknown model {name!r}; registered: {sorted(MODELS)}")
    return MODELS[name]


def make_loss_adapter(name: str, cfg):
    """Uniform loss interface for the DKT loop: fn(outputs_dict, flow_gt,
    valid) -> (loss, metrics, mask, ok), mirroring the reference's
    ``loss_func(results, disp_gt, valid, args=args)`` convention
    (tools/ft_dkt.py:227-228)."""
    from dkt_stereo_tpu.losses.cgi import loss_cgi
    from dkt_stereo_tpu.losses.gwc import loss_gwcnet
    from dkt_stereo_tpu.losses.pcv import sequence_loss_pcvnet
    from dkt_stereo_tpu.losses.sequence import sequence_loss_igev, sequence_loss_raft

    if name == "RAFTStereo":
        return lambda out, gt, v: sequence_loss_raft(out["disp_preds"], gt, v)
    if name == "IGEVStereo":
        # init_disp term included: the scan stop-grads the incoming disp, so
        # the 3D classifier / init-spx branch trains only through it
        return lambda out, gt, v: sequence_loss_igev(
            out["disp_preds"], out["init_disp"], gt, v, max_disp=cfg.max_disp
        )
    if name == "GWCNet":
        return lambda out, gt, v: loss_gwcnet(out["disp_preds"], gt, v, cfg.maxdisp)
    if name == "CGI_Stereo":
        return lambda out, gt, v: loss_cgi(out["disp_preds"], gt, v, cfg.maxdisp)
    if name == "PCVNet":
        return lambda out, gt, v: sequence_loss_pcvnet(out["output_list"], gt, v)
    raise KeyError(name)
