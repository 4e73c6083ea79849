"""Structured Streaming extension (SURVEY.md §2.10).

The reference has no streaming — recurrence is cron batch — so this is a
capability extension: the events table as a stream, with watermarked
tumbling windows and session windows replacing the batch sessionization.
"""
