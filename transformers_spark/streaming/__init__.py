from .windows import sessionize, streaming_event_counts, run_available_now

__all__ = ["streaming_event_counts", "sessionize", "run_available_now"]
