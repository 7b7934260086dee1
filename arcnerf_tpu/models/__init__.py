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
