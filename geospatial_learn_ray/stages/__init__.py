"""Dataset→Dataset operators (the engine's operator inventory, SURVEY.md §2)."""
