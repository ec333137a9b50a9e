from .packing import (PackedBatch, batch_packed_rows, pack_sequences,
                      packing_efficiency, pad_batch)

__all__ = ["PackedBatch", "pack_sequences", "pad_batch",
           "batch_packed_rows", "packing_efficiency"]
