from .io import load_table, read_wistia_events_json, read_wistia_media_json, latest_run_files

__all__ = [
    "load_table",
    "read_wistia_events_json",
    "read_wistia_media_json",
    "latest_run_files",
]
