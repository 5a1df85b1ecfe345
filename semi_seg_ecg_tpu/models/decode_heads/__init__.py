from .fcn_head import FCNHead  # noqa: F401
