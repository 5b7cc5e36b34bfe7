from degnorm_tpu.data.buckets import GeneBucket, pack_buckets  # noqa: F401
