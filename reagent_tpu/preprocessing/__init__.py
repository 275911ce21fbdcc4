"""Feature normalization: host-side identification + jitted on-device preprocessing."""
