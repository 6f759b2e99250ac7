"""Text / dedup / similarity query surface — filled in as operators land."""
