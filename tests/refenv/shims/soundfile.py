"""soundfile stub: audio_conditioning.py:11 imports it at module scope but
never calls it; reading raises so misuse is loud."""


def read(*a, **kw):
    raise RuntimeError("soundfile shim: not implemented (the reference "
                       "imports soundfile but never calls it)")


def write(*a, **kw):
    raise RuntimeError("soundfile shim: not implemented")
