"""Host-side utility helpers (serialization, lists, boxes, time)."""
