"""Sources: synthetic crawl tables + binary record-log readers."""
