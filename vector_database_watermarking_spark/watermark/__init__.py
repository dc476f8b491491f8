from .tvp import tvp_embed, rs_embed, tvp_extract, classify_compat

__all__ = ["tvp_embed", "rs_embed", "tvp_extract", "classify_compat"]
