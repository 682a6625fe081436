"""Host-side database layer: collections, segments, durability, filters.

The TPU-native counterpart of the reference's `src/db/` (C++): the column
store, WAL, version manifest, pk map and delete store run on the TPU-VM host;
vector data is streamed into device-resident segment shards and all scoring
happens in `zvec_tpu.ops` kernels.
"""

from .collection_impl import CollectionImpl

__all__ = ["CollectionImpl"]
