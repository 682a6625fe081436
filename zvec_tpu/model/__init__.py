from .doc import Doc
from .schema import CollectionSchema, CollectionStats, FieldSchema, VectorSchema

__all__ = [
    "Doc",
    "CollectionSchema",
    "CollectionStats",
    "FieldSchema",
    "VectorSchema",
]
