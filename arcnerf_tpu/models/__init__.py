"""Model zoo: build_model factory + FullModel composition.

Mirrors /root/reference/arcnerf/models/__init__.py:19 (build_model) with the
same registry-driven extensibility; models are flax.linen modules over a
functional train state.
"""

from ..utils.cfgs import valid_key_in_cfgs
from ..utils.registry import MODEL_REGISTRY


def build_model(cfgs, logger=None):
    """Build fg model (cfgs.model.type) + optional bkg model
    (cfgs.model.background.type) composed into a FullModel."""
    from .full_model import FullModel  # late import to avoid cycles

    fg_cls = MODEL_REGISTRY.get(cfgs.model.type)
    fg_model = fg_cls(cfgs=cfgs)

    bkg_model = None
    if valid_key_in_cfgs(cfgs.model, "background") and valid_key_in_cfgs(cfgs.model.background, "type"):
        bkg_cls = MODEL_REGISTRY.get(cfgs.model.background.type)
        bkg_model = bkg_cls(cfgs=cfgs)
        _check_bkg_cfgs(cfgs)

    if logger is not None:
        logger.add_log("Built model {} (bkg: {})".format(cfgs.model.type, bkg_model.__class__.__name__ if bkg_model else None))

    return FullModel(cfgs=cfgs, fg_model=fg_model, bkg_model=bkg_model)


# import model files so they register themselves
from . import nerf_model  # noqa: F401, E402
from . import mipnerf_model  # noqa: F401, E402
from . import neus_model  # noqa: F401, E402
from . import volsdf_model  # noqa: F401, E402
from . import hdrnerf_model  # noqa: F401, E402
from . import nerfpp_bkg_model  # noqa: F401, E402
from . import multivol_model  # noqa: F401, E402


def _check_bkg_cfgs(cfgs):
    """Blend-mode config invariants (reference full_model.py:42-52
    check_bkg_cfgs): rgb blend needs fg add_inf_z=False + bkg add_inf_z=True;
    sigma blend needs bkg add_inf_z=False."""
    from ..utils.cfgs import get_value_from_cfgs_field

    blend = get_value_from_cfgs_field(cfgs.model.background, "bkg_blend", "rgb")
    fg_inf = get_value_from_cfgs_field(cfgs.model.rays, "add_inf_z", False)
    bkg_rays = get_value_from_cfgs_field(cfgs.model.background, "rays", None)
    bkg_inf = get_value_from_cfgs_field(bkg_rays, "add_inf_z", True)
    if blend == "rgb":
        assert not fg_inf, "rgb blend: foreground must not add_inf_z"
        assert bkg_inf, "rgb blend: background must add_inf_z"
    elif blend == "sigma":
        assert not bkg_inf, "sigma blend: background must not add_inf_z"
    else:
        raise NotImplementedError("bkg_blend {} not supported".format(blend))
