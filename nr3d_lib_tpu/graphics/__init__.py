"""L2/L5: packed-tensor ops, ray ops, cameras, rendering algorithms."""
