"""Stub package for botocore (see boto3.py stub)."""
