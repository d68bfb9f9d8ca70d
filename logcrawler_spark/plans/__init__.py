"""Composed plans: the crawl-round pipeline and the Bloom URL-seen layer."""
