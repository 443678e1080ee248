from . import image, reporting, timing  # noqa: F401
