from .tables import load_table, load_embeddings, head_slice, tail_slice, union_new_from_back

__all__ = [
    "load_table",
    "load_embeddings",
    "head_slice",
    "tail_slice",
    "union_new_from_back",
]
