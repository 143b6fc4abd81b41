from . import codec, geotag, synth  # noqa: F401
