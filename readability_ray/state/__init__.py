from .context import default_partitions, ensure_hash_shuffle

__all__ = ["default_partitions", "ensure_hash_shuffle"]
