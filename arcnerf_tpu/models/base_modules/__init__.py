"""Base modules: encoders, geo/radiance networks, object bounds.

Mirrors /root/reference/arcnerf/models/base_modules/__init__.py (build_geo_model:28,
build_radiance_model:46) and encoding/__init__.py:26 (build_encoder).
"""

from ...utils.cfgs import get_value_from_cfgs_field, obj_to_dict
from ...utils.registry import ENCODER_REGISTRY, GEO_MODEL_REGISTRY, RADIANCE_MODEL_REGISTRY

from .encoding import (  # noqa: F401
    CompositeEmbedder,
    DenseGridEmbedder,
    FreqEmbedder,
    Gaussian,
    GaussianEmbedder,
    HashGridEmbedder,
    SHEmbedder,
)
from .networks import GeoNet, RadianceNet, FusedMLPGeoNet, FusedMLPRadianceNet  # noqa: F401


def build_encoder(cfgs):
    """Encoder factory. Default FreqEmbedder(n_freqs=0) == identity
    (reference encoding/__init__.py:26-51)."""
    if cfgs is None:
        return FreqEmbedder(input_dim=3, n_freqs=0)
    kwargs = obj_to_dict(cfgs)
    enc_type = kwargs.pop("type", "FreqEmbedder")
    return ENCODER_REGISTRY.get(enc_type)(**kwargs)


def build_geo_model(cfgs):
    """Geometry net factory (reference base_modules/__init__.py:28)."""
    kwargs = obj_to_dict(cfgs)
    net_type = kwargs.pop("type", "GeoNet")
    return GEO_MODEL_REGISTRY.get(net_type)(**kwargs)


def build_radiance_model(cfgs):
    """Radiance net factory (reference base_modules/__init__.py:46)."""
    kwargs = obj_to_dict(cfgs)
    net_type = kwargs.pop("type", "RadianceNet")
    return RADIANCE_MODEL_REGISTRY.get(net_type)(**kwargs)
