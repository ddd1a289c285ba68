from ros_vision_tpu.apriltag.families import TagFamily, get_family, list_families

__all__ = ["TagFamily", "get_family", "list_families"]
