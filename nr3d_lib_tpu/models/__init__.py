"""L3-L6: neural ops, spaces, accelerations, fields."""
