"""Alias for the reference ``gym_novel_gridworlds/constant.py`` keymaps."""

from ngx.compat.constant import env_key, assign_keys  # noqa: F401
