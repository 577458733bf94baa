from t2v.text.tokenizer import CLIPTokenizer
from t2v.text.prompt_parser import parse_prompt_attention
from t2v.text.schedule import parse_prompt_schedule

__all__ = ["CLIPTokenizer", "parse_prompt_attention", "parse_prompt_schedule"]
