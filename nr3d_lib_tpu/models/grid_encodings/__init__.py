"""Grid encodings: LoTD + permutohedral (reference: nr3d_lib/models/grid_encodings/)."""
