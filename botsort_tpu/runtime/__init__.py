"""Runtime: device/cache management, model assets, native extensions."""
