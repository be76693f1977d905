"""Sources & sinks for the documents table."""
