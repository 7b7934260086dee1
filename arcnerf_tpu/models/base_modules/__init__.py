"""Base modules: encoders, geo/radiance networks, object bounds.

Mirrors /root/reference/arcnerf/models/base_modules/__init__.py (build_geo_model:28,
build_radiance_model:46) and encoding/__init__.py:26 (build_encoder).
"""

from collections.abc import Mapping

from ...utils.cfgs import Obj, obj_to_dict
from ...utils.registry import ENCODER_REGISTRY, GEO_MODEL_REGISTRY, RADIANCE_MODEL_REGISTRY


def to_plain_dict(cfgs):
    """Obj / (Frozen)dict tree -> plain nested dict (linen freezes dict
    attributes, so configs may arrive as FrozenDict)."""
    if isinstance(cfgs, Obj):
        cfgs = obj_to_dict(cfgs)
    if isinstance(cfgs, Mapping):
        return {k: to_plain_dict(v) for k, v in cfgs.items()}
    return cfgs

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


def _filter_kwargs(cls, kwargs):
    """Keep only kwargs the module dataclass declares (configs may carry
    extra annotation-style keys like ``backend``)."""
    fields = set(getattr(cls, "__dataclass_fields__", {}).keys())
    return {k: v for k, v in kwargs.items() if k in fields}


def build_encoder(cfgs):
    """Encoder factory. Default FreqEmbedder(n_freqs=0) == identity
    (reference encoding/__init__.py:26-51)."""
    if cfgs is None:
        return FreqEmbedder(input_dim=3, n_freqs=0)
    kwargs = to_plain_dict(cfgs)
    enc_type = kwargs.pop("type", "FreqEmbedder")
    cls = ENCODER_REGISTRY.get(enc_type)
    return cls(**_filter_kwargs(cls, kwargs))


def build_geo_model(cfgs, needs_input_grad=False):
    """Geometry net factory (reference base_modules/__init__.py:28).

    ``needs_input_grad``: set by SDF models (neus/volsdf) whose normals are
    ``jax.grad`` of this net wrt the input points — it disables the
    HashGridEmbedder's fused-interpolation lookup (fuse_interp=False),
    whose custom VJP deliberately drops the xyz gradient path through the
    trilinear weights (encoding._hash_lookup_fused gradient contract)."""
    kwargs = to_plain_dict(cfgs)
    net_type = kwargs.pop("type", "GeoNet")
    cls = GEO_MODEL_REGISTRY.get(net_type)
    if needs_input_grad:
        enc = kwargs.get("encoder")
        if isinstance(enc, dict):
            if isinstance(enc.get("pts"), dict):
                enc["pts"]["fuse_interp"] = False
            else:
                enc["fuse_interp"] = False
    return cls(**_filter_kwargs(cls, kwargs))


def build_radiance_model(cfgs):
    """Radiance net factory (reference base_modules/__init__.py:46)."""
    kwargs = to_plain_dict(cfgs)
    net_type = kwargs.pop("type", "RadianceNet")
    cls = RADIANCE_MODEL_REGISTRY.get(net_type)
    return cls(**_filter_kwargs(cls, kwargs))
