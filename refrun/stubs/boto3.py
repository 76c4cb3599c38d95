"""Stub: the reference's vendored HF file_utils imports boto3 at module
level (reference: models/file_utils.py:22) but S3 paths are never hit
when training from scratch."""


def resource(*a, **k):
    raise RuntimeError("boto3 stub: S3 access attempted")


def client(*a, **k):
    raise RuntimeError("boto3 stub: S3 access attempted")
