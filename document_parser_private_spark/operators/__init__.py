"""DataFrame -> DataFrame transform operators."""
