from . import h3_fns, image_fns  # noqa: F401
