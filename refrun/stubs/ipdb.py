"""Stub: the reference's utils/__init__.py does a stray `import ipdb`
(reference: utils/__init__.py:10); never actually used at runtime."""


def set_trace(*a, **k):
    raise RuntimeError("ipdb stub: set_trace called")
