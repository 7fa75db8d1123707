"""Pure kernels: tile grid math, web-mercator, cell index, WKB, text."""
